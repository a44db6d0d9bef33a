"""Checkpointing prepared solver state.

The reference cannot pickle its ExpertSolver because the prepared state
lives in raw C buffers (acknowledged gap, reference: TODO.md:73-81).  Here
the prepared state is a pytree of arrays, so persistence is trivial; these
helpers write/read a :class:`wlsqm_tpu.fitter.engine.Prepared` to a single
``.npz`` file — enough to stop and resume an IBVP time-stepping run without
re-factorizing, or to ship prepared geometry between hosts.

For orchestrated checkpointing inside a larger JAX training state, simply
put the Prepared object inside your checkpointed pytree (orbax etc.) — it
is a registered dataclass pytree.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from wlsqm_tpu.fitter.engine import Prepared

__all__ = ["save_prepared", "load_prepared"]

_META = ("dimension", "solver", "precision")
_OPTIONAL = ("A_scaled", "c_lo", "w_lo", "dof_scale")


def _flatten_fac(fac):
    """Flatten the factorization tuple into named arrays.

    Cholesky: a single (B,n,n) array, or the unrolled tuple-of-tuples of
    (B,) entries; LU: (lu, pivots).
    """
    (first, *rest) = fac
    if isinstance(first, tuple):  # unrolled cholesky: tuple-of-tuples
        out = {}
        for i, row in enumerate(first):
            for j, v in enumerate(row):
                out[f"fac_L_{i}_{j}"] = np.asarray(v)
        out["fac_kind"] = np.asarray("unrolled")
        return out
    out = {"fac_0": np.asarray(first), "fac_kind": np.asarray("dense")}
    for i, v in enumerate(rest, start=1):
        out[f"fac_{i}"] = np.asarray(v)
    return out


def _unflatten_fac(d):
    kind = str(d["fac_kind"])
    if kind == "unrolled":
        rows = []
        i = 0
        while f"fac_L_{i}_0" in d:
            row = []
            j = 0
            while f"fac_L_{i}_{j}" in d:
                row.append(jnp.asarray(d[f"fac_L_{i}_{j}"]))
                j += 1
            rows.append(tuple(row))
            i += 1
        return (tuple(rows),)
    fac = []
    i = 0
    while f"fac_{i}" in d:
        fac.append(jnp.asarray(d[f"fac_{i}"]))
        i += 1
    return tuple(fac)


def save_prepared(path: str, prep: Prepared) -> None:
    """Write a Prepared pytree to ``path`` (.npz)."""
    arrays = {}
    for name in ("c", "w", "row_scale", "col_scale", "active", "known",
                 "unknown", "xi", "cond_orig", "cond_scaled", "ruiz_iters"):
        arrays[name] = np.asarray(getattr(prep, name))
    for name in _OPTIONAL:
        v = getattr(prep, name)
        if v is not None:
            arrays["opt_" + name] = np.asarray(v)
    arrays.update(_flatten_fac(prep.fac))
    for name in _META:
        arrays["meta_" + name] = np.asarray(getattr(prep, name))
    np.savez_compressed(path, **arrays)


def load_prepared(path: str) -> Prepared:
    """Read a Prepared pytree from ``path``."""
    with np.load(path, allow_pickle=False) as z:
        d = {k: z[k] for k in z.files}
    kwargs = {}
    for name in ("c", "w", "row_scale", "col_scale", "active", "known",
                 "unknown", "xi", "cond_orig", "cond_scaled", "ruiz_iters"):
        kwargs[name] = jnp.asarray(d[name])
    for name in _OPTIONAL:
        key = "opt_" + name
        kwargs[name] = jnp.asarray(d[key]) if key in d else None
    kwargs["fac"] = _unflatten_fac(d)
    for name in _META:
        v = d["meta_" + name].item()
        kwargs[name] = int(v) if name == "dimension" else str(v)
    return Prepared(**kwargs)
