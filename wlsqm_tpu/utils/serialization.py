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

__all__ = ["save_prepared", "load_prepared",
           "save_prepared_orbax", "load_prepared_orbax",
           "prepared_state_dict", "prepared_from_state_dict"]

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


def prepared_state_dict(prep: Prepared) -> dict:
    """Flatten a Prepared into a flat {name: ndarray} dict (round-trips
    through :func:`prepared_from_state_dict`)."""
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
    return arrays


def prepared_from_state_dict(d: dict) -> Prepared:
    """Rebuild a Prepared from :func:`prepared_state_dict` output."""
    kwargs = {}
    for name in ("c", "w", "row_scale", "col_scale", "active", "known",
                 "unknown", "xi", "cond_orig", "cond_scaled", "ruiz_iters"):
        kwargs[name] = jnp.asarray(d[name])
    for name in _OPTIONAL:
        key = "opt_" + name
        kwargs[name] = jnp.asarray(d[key]) if key in d else None
    kwargs["fac"] = _unflatten_fac(d)
    for name in _META:
        v = np.asarray(d["meta_" + name]).item()
        kwargs[name] = int(v) if name == "dimension" else str(v)
    return Prepared(**kwargs)


def save_prepared(path: str, prep: Prepared) -> None:
    """Write a Prepared pytree to ``path`` (.npz)."""
    np.savez_compressed(path, **prepared_state_dict(prep))


def load_prepared(path: str) -> Prepared:
    """Read a Prepared pytree from ``path``."""
    with np.load(path, allow_pickle=False) as z:
        d = {k: z[k] for k in z.files}
    return prepared_from_state_dict(d)


def _encode_str_arrays(d: dict) -> dict:
    """Orbax stores numeric arrays; encode string scalars as uint8 bytes."""
    out = {}
    for k, v in d.items():
        v = np.asarray(v)
        if v.dtype.kind in ("U", "S"):
            out["str_" + k] = np.frombuffer(
                str(v.item()).encode("utf-8"), dtype=np.uint8).copy()
        else:
            out[k] = v
    return out


def _decode_str_arrays(d: dict) -> dict:
    out = {}
    for k, v in d.items():
        if k.startswith("str_"):
            out[k[4:]] = np.asarray(
                bytes(np.asarray(v, np.uint8)).decode("utf-8"))
        else:
            out[k] = v
    return out


def save_prepared_orbax(path: str, prep: Prepared) -> None:
    """Checkpoint a Prepared with orbax (directory-based, atomic, async).

    For deployments standardized on orbax: the same flat state dict as the
    ``.npz`` helpers, stored through ``PyTreeCheckpointer`` (sharded-array
    aware, atomic directory renames).  ``path`` must be an absolute
    directory path that does not yet exist.
    """
    import orbax.checkpoint as ocp

    state = _encode_str_arrays(prepared_state_dict(prep))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state)


def load_prepared_orbax(path: str) -> Prepared:
    """Restore a Prepared saved by :func:`save_prepared_orbax`."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        state = ckptr.restore(path)
    return prepared_from_state_dict(_decode_str_arrays(state))
