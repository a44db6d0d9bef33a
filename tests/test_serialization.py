"""Prepared-state checkpointing: save -> load -> identical solves."""

import numpy as np
import pytest
import jax.numpy as jnp

import wlsqm_tpu as wt
from wlsqm_tpu.utils.serialization import load_prepared, save_prepared


def _prep_and_data(rng, precision="f64", solver="chol"):
    B, K = 12, 25
    xk = rng.uniform(-1, 1, (B, K, 2))
    fk = rng.standard_normal((B, K))
    prep = wt.prepare(xk, np.zeros((B, 2)), order=3, solver=solver,
                      precision=precision,
                      scaling="jacobi" if precision != "f64" else "ruiz")
    return prep, jnp.asarray(fk)


def test_roundtrip_f64(rng, tmp_path):
    prep, fk = _prep_and_data(rng)
    fi1, _ = wt.solve(prep, fk)
    path = str(tmp_path / "prep.npz")
    save_prepared(path, prep)
    prep2 = load_prepared(path)
    fi2, _ = wt.solve(prep2, fk)
    np.testing.assert_array_equal(np.asarray(fi1), np.asarray(fi2))
    assert prep2.dimension == prep.dimension
    assert prep2.precision == prep.precision


@pytest.mark.full
def test_roundtrip_ds_unrolled(rng, tmp_path, monkeypatch):
    # serialization mechanics only — bypass the ds-fidelity canary, which
    # (correctly) blocks explicit ds on backends that degrade pairs
    monkeypatch.setenv("WLSQM_TPU_ALLOW_DEGRADED_DS", "1")
    prep, fk = _prep_and_data(rng, precision="ds", solver="chol_unrolled")
    fi1, _ = wt.solve(prep, fk)
    path = str(tmp_path / "prep_ds.npz")
    save_prepared(path, prep)
    prep2 = load_prepared(path)
    fi2, _ = wt.solve(prep2, fk)
    np.testing.assert_array_equal(np.asarray(fi1), np.asarray(fi2))


def test_orbax_roundtrip(tmp_path, rng):
    pytest.importorskip("orbax.checkpoint")
    from wlsqm_tpu.utils.serialization import (save_prepared_orbax,
                                               load_prepared_orbax)

    B, K = 16, 12
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.3, 0.3, (B, K, 2))
    prep = wt.prepare(xk, xi, order=2)

    path = str(tmp_path / "ckpt")
    save_prepared_orbax(path, prep)
    back = load_prepared_orbax(path)

    fk = np.sin(xk[..., 0])
    fi1, _ = wt.solve(prep, fk)
    fi2, _ = wt.solve(back, fk)
    np.testing.assert_array_equal(np.asarray(fi1), np.asarray(fi2))


def test_state_dict_pair_roundtrip(rng):
    """prepared_state_dict / prepared_from_state_dict: the flat-dict layer
    shared by the npz and orbax helpers, usable with any checkpointer."""
    from wlsqm_tpu.utils.serialization import (
        prepared_from_state_dict, prepared_state_dict,
    )

    B, K = 32, 12
    xk = rng.uniform(-1, 1, (B, K, 2))
    prep = wt.prepare(xk, np.zeros((B, 2)), order=2)
    state = prepared_state_dict(prep)
    assert all(isinstance(k, str) for k in state)
    prep2 = prepared_from_state_dict(state)
    fk = np.sin(xk[..., 0])
    fi1, _ = wt.solve(prep, fk)
    fi2, _ = wt.solve(prep2, fk)
    np.testing.assert_array_equal(np.asarray(fi1), np.asarray(fi2))
