"""Lightweight profiling hooks.

The reference has no built-in tracing (SURVEY §5); its examples use a
wall-clock timer context manager.  Here the real profiler is JAX's
(``jax.profiler.trace`` + TensorBoard/XProf); these helpers cover the two
conveniences users actually reach for: a wall-clock timer that synchronizes
the device, and a one-call wrapper around the JAX trace context.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["Timer", "device_trace"]


class Timer:
    """Wall-clock timer context that synchronizes outstanding device work.

    >>> with Timer("solve") as t:
    ...     fi, _ = wt.solve(prep, fk)
    ...     jax.block_until_ready(fi)
    >>> t.seconds
    """

    def __init__(self, label: str = "", sync: bool = True, quiet: bool = False):
        self.label = label
        self.sync = sync
        self.quiet = quiet
        self.seconds = None

    def __enter__(self):
        if self.sync:
            jax.effects_barrier()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync:
            jax.effects_barrier()
        self.seconds = time.perf_counter() - self._t0
        if not self.quiet and self.label:
            print(f"[{self.label}] {self.seconds:.4f} s")
        return False


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a JAX/XLA profiler trace viewable in TensorBoard/XProf."""
    with jax.profiler.trace(logdir):
        yield
