"""Precision / platform configuration for wlsqm_tpu.

WLSQM solves small, potentially ill-conditioned dense systems; the reference
implementation (reference: wlsqm/fitter/impl.pyx, README.md:76-78) is float64
throughout, and the parity bar for this rebuild is 1e-10 relative agreement.
Therefore the package enables JAX 64-bit mode on import unless the user opts
out by setting the environment variable ``WLSQM_TPU_NO_X64=1`` *before*
importing :mod:`wlsqm_tpu`.

On TPU, float64 is software-emulated by XLA; the fast path (float32 assembly +
iterative refinement) can be selected per-call via ``dtype=jnp.float32``
arguments on the functional API.
"""

from __future__ import annotations

import os

import jax

_X64_WANTED = os.environ.get("WLSQM_TPU_NO_X64", "0") != "1"

if _X64_WANTED:
    jax.config.update("jax_enable_x64", True)

# WLSQM_TPU_PLATFORM=<name> pins jax_platforms at import (e.g. "cpu").
# Unlike the JAX_PLATFORMS environment variable, this survives runtimes
# whose site customization re-registers an accelerator platform at
# interpreter start: the config update runs when wlsqm_tpu is imported,
# after any sitecustomize.  Used by scripts that must run on the host
# regardless of attached devices (benchmarks/run_reference_suite.sh).
_PLATFORM = os.environ.get("WLSQM_TPU_PLATFORM")
if _PLATFORM:
    jax.config.update("jax_platforms", _PLATFORM)

# On TPU, f32 contractions default to single-pass bf16 on the MXU (~8
# mantissa bits) — catastrophic for normal-matrix assembly.  The critical
# einsums pass precision=HIGHEST explicitly; this global default protects
# the remaining contractions (evaluation, kNN) as well.  Opt out with
# WLSQM_TPU_DEFAULT_MATMUL_PRECISION=default.
_MM_PREC = os.environ.get("WLSQM_TPU_DEFAULT_MATMUL_PRECISION", "highest")
if _MM_PREC != "default":
    jax.config.update("jax_default_matmul_precision", _MM_PREC)


# the fused kernels take 40s-8min of Mosaic/XLA compilation per shape; a
# persistent on-disk cache makes them one-time per machine.  Opt in with
# WLSQM_TPU_COMPILE_CACHE=<dir> (or "1" for the default location) — opt-in
# because writing to disk on import should be the user's call.
_CACHE = os.environ.get("WLSQM_TPU_COMPILE_CACHE")
if _CACHE:
    if _CACHE == "1":
        _CACHE = os.path.expanduser("~/.cache/wlsqm_tpu/xla")
    os.makedirs(_CACHE, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def cache_dir() -> str | None:
    """The opt-in persistent cache directory, or None when not enabled.

    Shared by the XLA compilation cache and the ds-fidelity canary verdict
    (:func:`wlsqm_tpu.fitter.engine_ds.ds_backend_ok`), so one
    ``WLSQM_TPU_COMPILE_CACHE`` setting makes both one-time per machine.
    """
    return _CACHE


def default_dtype():
    """The default floating dtype for fitting (float64 unless x64 disabled)."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


# ---------------------------------------------------------------------------
# Compat-layer kernel routing (explicit knob).
#
# The drop-in ``wlsqm`` compat layer (``fit_*``, ``ExpertSolver`` with the
# default precision) may route eligible batches through the fused ds-grade
# Pallas kernel on TPU.  The documented default accuracy contract of that
# routing is **ds-grade**: ~1e-12 typical agreement with the f64 engine, a
# conditioning-driven floor of roughly cond(A_scaled) x 1e-13 on the
# highest-degree DOFs of ill-conditioned order-4 fits (see docs/porting.md).
# Select "f64" to keep the compat layer on the emulated-f64 engine for
# strict reference parity; the WLSQM_TPU_NO_KERNEL_COMPAT environment
# variable provides the same opt-out at process start.
#
# APIs that take an explicit ``precision`` argument (``ExpertSolver``,
# ``api.fit_many``) always honor it: ``precision="f64"`` never routes
# through the ds kernel regardless of this knob.
# ---------------------------------------------------------------------------

_COMPAT_PRECISION = ("f64" if os.environ.get("WLSQM_TPU_NO_KERNEL_COMPAT")
                     else "ds")


def set_compat_precision(mode: str) -> None:
    """Set the compat layer's auto-routing precision: "ds" or "f64"."""
    global _COMPAT_PRECISION
    if mode not in ("ds", "f64"):
        raise ValueError(
            "compat precision must be 'ds' (kernel routing allowed) or "
            "'f64' (strict engine parity); got %r" % (mode,))
    _COMPAT_PRECISION = mode


def compat_precision() -> str:
    """The compat layer's auto-routing precision ("ds" or "f64")."""
    return _COMPAT_PRECISION


# ---------------------------------------------------------------------------
# ALGO_ITERATIVE iteration-count fidelity.  The reference's exact-
# stagnation rule compares consecutive f64 l-inf residual norms for
# bitwise equality (reference: wlsqm/fitter/impl.pyx:1057-1061); the
# kernel evaluates the same rule in extended (ds-pair) arithmetic on
# DOFs that differ from the engine's at ~1e-12, so the iteration at
# which two norms collide bitwise is chaotic — DOFs agree to the
# documented envelope, but the returned COUNTS follow a different
# distribution (measured table: benchmarks/run_iter_parity.py; order-2
# medians match, order-4 kernel counts saturate later).  Callers who
# BRANCH on the returned count can pin iterative calls to the engine.
#
# Default is SCOPED (round 5): the drop-in compat surface (``wlsqm.*``
# ``fit_*_iterative*`` entries and ``ExpertSolver`` with
# ALGO_ITERATIVE) defaults to fidelity ON — reference users branch on
# the returned counts (reference: wlsqm/fitter/simple.pyx:103-105) and
# must not get silently different control flow — while the JAX-native
# ``wlsqm_tpu.api`` keeps the fast kernel default.  An explicit
# ``set_iter_count_fidelity()`` call or the environment variable
# overrides both scopes.
# ---------------------------------------------------------------------------

def _env_tristate(name: str):
    v = os.environ.get(name)
    if v is None:
        return None
    return v.strip().lower() not in ("", "0", "false", "off", "no")


_ITER_COUNT_FIDELITY = _env_tristate("WLSQM_TPU_ITER_COUNT_FIDELITY")


def set_iter_count_fidelity(enabled: bool | None) -> None:
    """Route compat/auto ALGO_ITERATIVE calls to the f64 engine so the
    returned iteration counts carry the reference's exact f64
    stagnation semantics (at engine speed).  ``None`` restores the
    scoped defaults (compat surface: on; ``wlsqm_tpu.api``: off)."""
    global _ITER_COUNT_FIDELITY
    _ITER_COUNT_FIDELITY = None if enabled is None else bool(enabled)


def iter_count_fidelity(compat: bool = False) -> bool:
    """Whether iterative calls must keep f64 count semantics.

    ``compat=True`` is passed by the drop-in compat surface, whose
    scoped default is fidelity ON; explicit settings win for both.
    """
    if _ITER_COUNT_FIDELITY is not None:
        return _ITER_COUNT_FIDELITY
    return compat
