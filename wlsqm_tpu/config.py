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


def default_dtype():
    """The default floating dtype for fitting (float64 unless x64 disabled)."""
    import jax.numpy as jnp

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
