"""Fused Pallas fit kernel — interpreter-mode checks.

On CPU the kernel runs through the Pallas interpreter, where the ds pair
arithmetic is subject to the known XLA-CPU fusion degradation (see
ops/twofloat docstring), so tolerances here are f32-grade; the f64-grade
accuracy claim (~1e-12) is validated on real TPU hardware (recorded in
BASELINE.md / bench logs).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import wlsqm_tpu as wt
from wlsqm_tpu.fitter import defs, engine
from wlsqm_tpu.ops.pallas_fit import TILE, fit_pallas, supported


# quick-tier problem size: two (1, 128) case tiles instead of the full
# hardware TILE — interpret-mode wall time scales with B, and tile_s /
# batch-size invariance is pinned separately (test_tile_s_bit_identity)
QB, QTS = 256, 2


def _problem(rng, B, K=20, clustered=False):
    if clustered:
        centers = rng.uniform(-1, 1, (B, 2))
        xk = centers[:, None, :] + rng.uniform(-0.2, 0.2, (B, K, 2))
    else:
        centers = np.zeros((B, 2))
        xk = rng.uniform(-1, 1, (B, K, 2))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1])
    return (jnp.asarray(xk), jnp.asarray(fk),
            jnp.full((B,), K, jnp.int32), jnp.asarray(centers))


@pytest.mark.parametrize("order,weighting", [
    (2, defs.WEIGHT_UNIFORM),
    pytest.param(4, defs.WEIGHT_CENTER, marks=pytest.mark.full),
])
def test_matches_engine(rng, order, weighting):
    xk, fk, nk, xi = _problem(rng, QB, K=16)
    fi_p = np.asarray(fit_pallas(xk, fk, nk, xi, dimension=2, order=order,
                                 weighting=weighting, interpret=True,
                                 tile_s=QTS, refine_steps=2))
    NO = wt.number_of_dofs(2, order)
    B = QB
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((B, NO)),
        jnp.full((B,), order, jnp.int32), jnp.zeros((B,), jnp.int64),
        jnp.full((B,), weighting, jnp.int32), dimension=2, NO=NO)
    rel = np.abs(fi_p - np.asarray(f64)).max() / np.abs(np.asarray(f64)).max()
    assert rel < 5e-5, f"rel={rel:.2e}"  # f32-grade bound in interpret mode


@pytest.mark.full
def test_clustered_neighborhoods(rng):
    """Small-radius clouds exercise the power-of-two prescale."""
    xk, fk, nk, xi = _problem(rng, QB, K=12, clustered=True)
    fi_p = np.asarray(fit_pallas(xk, fk, nk, xi, dimension=2, order=2,
                                 weighting=defs.WEIGHT_CENTER, interpret=True,
                                 tile_s=QTS, refine_steps=2))
    assert np.isfinite(fi_p).all()
    # F DOF approximates the field at the center
    truth = np.sin(np.asarray(xi)[:, 0]) * np.cos(np.asarray(xi)[:, 1])
    assert np.abs(fi_p[:, 0] - truth).max() < 1e-2


def test_ragged_nk(rng):
    xk, fk, nk, xi = _problem(rng, QB, K=24)
    nk = jnp.asarray(
        np.where(np.arange(QB) % 2 == 0, 24, 17).astype(np.int32))
    fi_p = np.asarray(fit_pallas(xk, fk, nk, xi, dimension=2, order=2,
                                 weighting=defs.WEIGHT_UNIFORM,
                                 interpret=True, tile_s=QTS,
                                 refine_steps=2))
    NO = 6
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((QB, NO)),
        jnp.full((QB,), 2, jnp.int32), jnp.zeros((QB,), jnp.int64),
        jnp.full((QB,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO)
    rel = np.abs(fi_p - np.asarray(f64)).max() / np.abs(np.asarray(f64)).max()
    assert rel < 5e-6


def test_supported_predicate():
    assert supported(2, np.full(4, 2), np.zeros(4), np.full(4, 1))
    assert not supported(2, np.array([2, 3]), np.zeros(2), np.full(2, 1))
    assert not supported(2, np.full(4, 2), np.array([1, 0, 0, 0]),
                         np.full(4, 1))
    assert not supported(2, np.full(4, 2), np.zeros(4), np.array([1, 2, 1, 1]))


@pytest.mark.full
def test_recompute_basis_variant(rng, monkeypatch):
    """The no-store variant (basis recomputed per matvec) matches the stored
    one; it is what makes 3D order-4 (NO=35) fit in VMEM."""
    from wlsqm_tpu.ops import pallas_fit

    # 3D order-4 at a realistic K no longer fits with stored basis rows,
    # but is eligible via recomputation
    assert not pallas_fit._store_basis(3, 4, 48)
    assert pallas_fit.vmem_ok(3, 4, 48)
    assert pallas_fit.supported(3, np.full(2, 4), np.zeros(2),
                                np.full(2, defs.WEIGHT_UNIFORM), K=48)

    # K=13 is a shape no other test uses, so the jitted fit_pallas retraces
    # and picks up the monkeypatched store decision
    xk, fk, nk, xi = _problem(rng, QB, K=13)
    monkeypatch.setattr(pallas_fit, "_store_basis", lambda *a: False)
    got = np.asarray(fit_pallas(xk, fk, nk, xi, dimension=2, order=2,
                                weighting=defs.WEIGHT_CENTER, interpret=True,
                                tile_s=QTS, refine_steps=2))
    NO = 6
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((QB, NO)),
        jnp.full((QB,), 2, jnp.int32), jnp.zeros((QB,), jnp.int64),
        jnp.full((QB,), defs.WEIGHT_CENTER, jnp.int32),
        dimension=2, NO=NO)
    rel = np.abs(got - np.asarray(f64)).max() / np.abs(np.asarray(f64)).max()
    assert rel < 5e-6


@pytest.mark.full
def test_sensitivities(rng):
    """In-kernel sens == engine sens (refined solves per neighbor RHS)."""
    xk, fk, nk, xi = _problem(rng, TILE, K=12)
    # ragged but with overdetermination margin (NO=6; nk >= 10)
    nk = jnp.asarray(np.where(np.arange(TILE) % 4 == 0, 10, 12)
                     .astype(np.int32))
    fi_p, sens_p = fit_pallas(xk, fk, nk, xi, dimension=2, order=2,
                              weighting=defs.WEIGHT_UNIFORM,
                              interpret=True, do_sens=True)
    NO = 6
    f64, s64, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((TILE, NO)),
        jnp.full((TILE,), 2, jnp.int32), jnp.zeros((TILE,), jnp.int64),
        jnp.full((TILE,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO, do_sens=True)
    s64 = np.asarray(s64)
    rel = np.abs(np.asarray(sens_p) - s64).max() / np.abs(s64).max()
    assert rel < 1e-6  # CPU-interpret ds bound; TPU lands ~1e-11
    # padded-neighbor sens must be exactly zero (matches the engine)
    mask = np.arange(12)[None, :] >= np.asarray(nk)[:, None]
    assert np.abs(np.asarray(sens_p)[mask]).max() == 0.0


@pytest.mark.full
def test_iterative(rng):
    """ALGO_ITERATIVE in-kernel: DOFs match the engine's iterative path."""
    xk, fk, nk, xi = _problem(rng, TILE, K=14)
    fi_p, iters = fit_pallas(xk, fk, nk, xi, dimension=2, order=2,
                             weighting=defs.WEIGHT_UNIFORM,
                             interpret=True, max_iter=4)
    NO = 6
    f64, _, it64, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((TILE, NO)),
        jnp.full((TILE,), 2, jnp.int32), jnp.zeros((TILE,), jnp.int64),
        jnp.full((TILE,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO, iterative=True, max_iter=4)
    rel = np.abs(np.asarray(fi_p) - np.asarray(f64)).max() \
        / np.abs(np.asarray(f64)).max()
    assert rel < 5e-6
    # iteration counts are bounded and positive; exact counts may differ
    # (f32 norms stagnate sooner than f64 — documented in porting.md)
    it = np.asarray(iters)
    assert it.min() >= 1 and it.max() <= 4


@pytest.mark.slow
def test_3d_order4_no35_interpret(rng, monkeypatch):
    """The NO=35 (3D order-4) kernel path through the interpreter.

    Marked slow: the Pallas interpreter executes the 35-DOF unrolled
    pipeline in ~6 minutes on CPU (measured; per-op interpreter overhead
    x ~NO^2*K ops), so the default suite skips it — run with
    ``pytest -m slow`` (verified passing, 347 s).  The NO=35 kernel is
    also hardware-validated on real TPU (benchmarks/README.md:
    2.38 M fits/s, 6.25e-11 vs a host f64 oracle at K=48 radius 1.0), and
    the XLA engine's NO=35 math is CI-covered
    by tests/test_fuzz_oracle.py.
    """
    from wlsqm_tpu.ops import pallas_fit

    # VMEM limits don't apply in interpret mode; storing the basis rows
    # keeps the interpreter's op count (and runtime) down
    monkeypatch.setattr(pallas_fit, "_store_basis", lambda *a: True)
    B, K, NO = TILE, 40, 35
    xi = np.asarray(rng.uniform(-1, 1, (B, 3)))
    xk = xi[:, None, :] + rng.uniform(-1, 1, (B, K, 3))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1]) + xk[..., 2] ** 2
    nk = jnp.full((B,), K, jnp.int32)
    fi_p = np.asarray(pallas_fit.fit_pallas(
        jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
        dimension=3, order=4, weighting=defs.WEIGHT_UNIFORM,
        interpret=True, refine_steps=1))
    f64, _, _, _ = engine.fit_batch(
        jnp.asarray(xk), jnp.asarray(fk), nk, jnp.asarray(xi),
        jnp.zeros((B, NO)), jnp.full((B,), 4, jnp.int32),
        jnp.zeros((B,), jnp.int64),
        jnp.full((B,), defs.WEIGHT_UNIFORM, jnp.int32), dimension=3, NO=NO)
    f64 = np.asarray(f64)
    rel = np.abs(fi_p - f64).max() / np.abs(f64).max()
    # CPU-interpret ds degradation at one refinement sweep; the TPU
    # hardware figure for this config is 6.5e-14 (benchmarks/README.md)
    assert rel < 5e-3, f"rel={rel:.2e}"


@pytest.mark.full
def test_iterative_with_knowns(rng):
    """ALGO_ITERATIVE + knowns: prescribed DOFs must not drift across
    corrective iterations (regression: the corrective solve used to feed the
    identity rows a nonzero RHS, drifting knowns from iteration 2 on)."""
    xk, fk, nk, xi = _problem(rng, TILE, K=14, clustered=True)
    NO = 6
    mask = int(defs.b2_F | defs.b2_X)
    fi0 = np.zeros((TILE, NO))
    fi0[:, 0] = np.sin(np.asarray(xi)[:, 0])
    fi0[:, 1] = 0.25
    fi_p, iters = fit_pallas(xk, fk, nk, xi, jnp.asarray(fi0),
                             dimension=2, order=2,
                             weighting=defs.WEIGHT_UNIFORM,
                             interpret=True, knowns=mask, max_iter=3)
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.asarray(fi0),
        jnp.full((TILE,), 2, jnp.int32), jnp.full((TILE,), mask, jnp.int64),
        jnp.full((TILE,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO, iterative=True, max_iter=3)
    fi_p, f64 = np.asarray(fi_p), np.asarray(f64)
    # knowns pass through bit-exactly even after >1 corrective iteration
    np.testing.assert_array_equal(fi_p[:, 0], fi0[:, 0])
    np.testing.assert_array_equal(fi_p[:, 1], fi0[:, 1])
    rel = np.abs(fi_p - f64).max() / np.abs(f64).max()
    assert rel < 5e-6
    assert np.asarray(iters).min() >= 1


@pytest.mark.full
def test_knowns_elimination(rng):
    """Static knowns bitmask in-kernel: prescribed DOFs pass through
    bit-exactly, unknowns match the engine, sens NaN pattern matches."""
    xk, fk, nk, xi = _problem(rng, TILE, K=14, clustered=True)
    NO = 6
    mask = int(defs.b2_F | defs.b2_X)
    fi0 = np.zeros((TILE, NO))
    fi0[:, 0] = np.sin(np.asarray(xi)[:, 0])
    fi0[:, 1] = 0.25
    fi_p, sens_p = fit_pallas(xk, fk, nk, xi, jnp.asarray(fi0),
                              dimension=2, order=2,
                              weighting=defs.WEIGHT_UNIFORM,
                              interpret=True, knowns=mask, do_sens=True)
    f64, s64, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.asarray(fi0),
        jnp.full((TILE,), 2, jnp.int32), jnp.full((TILE,), mask, jnp.int64),
        jnp.full((TILE,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO, do_sens=True)
    fi_p, f64 = np.asarray(fi_p), np.asarray(f64)
    rel = np.abs(fi_p - f64).max() / np.abs(f64).max()
    assert rel < 5e-6
    np.testing.assert_array_equal(fi_p[:, 0], fi0[:, 0])  # bit-exact knowns
    np.testing.assert_array_equal(fi_p[:, 1], fi0[:, 1])
    sp, s64 = np.asarray(sens_p), np.asarray(s64)
    fin = np.isfinite(s64)
    assert (np.isfinite(sp) == fin).all()
    assert np.abs(sp[fin] - s64[fin]).max() / np.abs(s64[fin]).max() < 1e-6


@pytest.mark.parametrize("order,weighting", [
    (2, defs.WEIGHT_UNIFORM),
    pytest.param(4, defs.WEIGHT_CENTER, marks=pytest.mark.full),
])
def test_ts_variant_matches_engine(rng, order, weighting):
    """precision="ts" (triple-single planes) runs the same pipeline.

    Interpret mode is subject to the XLA-CPU pair degradation (module
    docstring), so this checks plumbing + f32-grade agreement; the
    beyond-ds accuracy claim is validated on TPU
    (benchmarks/run_ladder_sweep.py, docs/kernel.md).
    """
    xk, fk, nk, xi = _problem(rng, QB, K=21)
    fi_t = np.asarray(fit_pallas(xk, fk, nk, xi, dimension=2, order=order,
                                 weighting=weighting, interpret=True,
                                 precision="ts", tile_s=QTS,
                                 refine_steps=3))
    NO = wt.number_of_dofs(2, order)
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((QB, NO)),
        jnp.full((QB,), order, jnp.int32), jnp.zeros((QB,), jnp.int64),
        jnp.full((QB,), weighting, jnp.int32), dimension=2, NO=NO)
    rel = np.abs(fi_t - np.asarray(f64)).max() / np.abs(np.asarray(f64)).max()
    assert rel < 5e-5, f"rel={rel:.2e}"


@pytest.mark.full
def test_ts_variant_knowns_and_iterative(rng):
    """ts plumbing through knowns elimination + ALGO_ITERATIVE."""
    xk, fk, nk, xi = _problem(rng, TILE, K=14, clustered=True)
    NO = 6
    mask = int(defs.b2_F)
    fi0 = np.zeros((TILE, NO))
    fi0[:, 0] = np.sin(np.asarray(xi)[:, 0])
    fi_t, iters = fit_pallas(xk, fk, nk, xi, jnp.asarray(fi0),
                             dimension=2, order=2,
                             weighting=defs.WEIGHT_UNIFORM, interpret=True,
                             knowns=mask, max_iter=3, precision="ts")
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.asarray(fi0),
        jnp.full((TILE,), 2, jnp.int32), jnp.full((TILE,), mask, jnp.int64),
        jnp.full((TILE,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO, iterative=True, max_iter=3)
    fi_t, f64 = np.asarray(fi_t), np.asarray(f64)
    np.testing.assert_array_equal(fi_t[:, 0], fi0[:, 0])  # bit-exact knowns
    rel = np.abs(fi_t - f64).max() / np.abs(f64).max()
    assert rel < 5e-5
    assert np.asarray(iters).min() >= 1


def test_ts_supported_vmem_accounting():
    """ts needs 1.5x the plane VMEM; the predicate accounts for it."""
    from wlsqm_tpu.ops import pallas_fit

    # 3D order-4 K=48 fits ds (recompute variant) and also ts
    assert pallas_fit.vmem_ok(3, 4, 48, nplanes=2)
    assert pallas_fit.supported(3, np.full(2, 4), np.zeros(2),
                                np.full(2, defs.WEIGHT_UNIFORM),
                                K=48, precision="ts") == \
        pallas_fit.vmem_ok(3, 4, 48, nplanes=3)


@pytest.mark.full
def test_tile_s_bit_identity(rng):
    """tile_s only changes the block layout: per-case results (DOFs and
    sensitivities) are bit-identical for any sublane count, and the VMEM
    accounting scales with it."""
    from wlsqm_tpu.ops import pallas_fit

    xk, fk, nk, xi = _problem(rng, 2048, K=16)
    kw = dict(dimension=2, order=2, weighting=defs.WEIGHT_CENTER,
              interpret=True, do_sens=True)
    fi8, s8 = fit_pallas(xk, fk, nk, xi, **kw)
    fi16, s16 = fit_pallas(xk, fk, nk, xi, tile_s=16, **kw)
    fi4, s4 = fit_pallas(xk, fk, nk, xi, tile_s=4, **kw)
    np.testing.assert_array_equal(np.asarray(fi8), np.asarray(fi16))
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s16))
    np.testing.assert_array_equal(np.asarray(fi8), np.asarray(fi4))
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s4))
    assert pallas_fit._vmem_bytes(2, 2, 16, True, tile_s=16) == \
        2 * pallas_fit._vmem_bytes(2, 2, 16, True, tile_s=8)


# ---------------------------------------------------------------- moments

def _engine_oracle(xk, fk, nk, xi, dimension, order, weighting, knowns=0,
                   fi_init=None):
    NO = wt.number_of_dofs(dimension, order)
    B = xk.shape[0]
    fi0 = jnp.zeros((B, NO)) if fi_init is None else jnp.asarray(fi_init)
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, fi0,
        jnp.full((B,), order, jnp.int32),
        jnp.full((B,), knowns, jnp.int64),
        jnp.full((B,), weighting, jnp.int32), dimension=dimension, NO=NO)
    return np.asarray(f64)


@pytest.mark.parametrize("dimension,order,weighting", [
    (1, 3, defs.WEIGHT_UNIFORM),
    (2, 2, defs.WEIGHT_CENTER),
    pytest.param(2, 4, defs.WEIGHT_CENTER, marks=pytest.mark.full),
    pytest.param(3, 2, defs.WEIGHT_CENTER, marks=pytest.mark.full),
])
def test_moment_assembly_matches_engine(rng, dimension, order, weighting):
    """The moment-assembly variant (A[j,m] = M[e_j+e_m] chains + packed
    pair normal matrix) solves the same problem as the basis-rows variant
    and the f64 engine.  In interpret mode the moment path's pair
    arithmetic survives XLA-CPU fusion better than the rows path (its
    converged fixed point is the stored pair matrix), so the bound here
    is tighter than the rows tests'."""
    NO = wt.number_of_dofs(dimension, order)
    B, K = QB, max(24, NO + 9)
    xi = rng.uniform(-1, 1, (B, dimension))
    xk = xi[:, None, :] + rng.uniform(-0.4, 0.4, (B, K, dimension))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., -1])
    nkv = rng.integers(NO + 5, K + 1, B)
    args = (jnp.asarray(xk), jnp.asarray(fk),
            jnp.asarray(nkv, jnp.int32), jnp.asarray(xi))
    com = dict(dimension=dimension, order=order, weighting=weighting,
               interpret=True, tile_s=QTS, refine_steps=2)
    fi_m = np.asarray(fit_pallas(*args, assembly="moments", **com))
    f64 = _engine_oracle(*args, dimension=dimension, order=order,
                         weighting=weighting)
    rel = np.abs(fi_m - f64).max() / np.abs(f64).max()
    assert rel < 5e-6, f"rel={rel:.2e}"


def test_moment_assembly_knowns(rng):
    """Knowns elimination through the moments (b_m -= g_j M[e_j+e_m]) is
    algebraically the per-neighbor elimination: prescribed DOFs pass
    through bit-exactly, unknowns match the engine."""
    B, K = QB, 16
    knowns = int(defs.b2_F | defs.b2_Y)
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.4, 0.4, (B, K, 2))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1])
    NO = wt.number_of_dofs(2, 2)
    gi = np.zeros((B, NO))
    gi[:, defs.i2_F] = np.sin(xi[:, 0]) * np.cos(xi[:, 1])
    gi[:, defs.i2_Y] = -np.sin(xi[:, 0]) * np.sin(xi[:, 1])
    args = (jnp.asarray(xk), jnp.asarray(fk),
            jnp.full((B,), K, jnp.int32), jnp.asarray(xi),
            jnp.asarray(gi))
    com = dict(dimension=2, order=2, weighting=defs.WEIGHT_CENTER,
               knowns=knowns, interpret=True, tile_s=QTS, refine_steps=2)
    fi_m = np.asarray(fit_pallas(*args, assembly="moments", **com))
    # prescribed values bit-exact
    np.testing.assert_array_equal(fi_m[:, defs.i2_F], gi[:, defs.i2_F])
    np.testing.assert_array_equal(fi_m[:, defs.i2_Y], gi[:, defs.i2_Y])
    f64 = _engine_oracle(jnp.asarray(xk), jnp.asarray(fk),
                         jnp.full((B,), K, jnp.int32), jnp.asarray(xi),
                         2, 2, defs.WEIGHT_CENTER, knowns=knowns,
                         fi_init=gi)
    un = [j for j in range(NO) if not (knowns >> j) & 1]
    rel = (np.abs(fi_m[:, un] - f64[:, un]).max()
           / np.abs(f64[:, un]).max())
    assert rel < 5e-6, f"rel={rel:.2e}"


def test_moment_auto_routing():
    """assembly='auto' picks moments for basic and iterative fits (VMEM
    permitting) and rows whenever sensitivities are requested; 'moments'
    with do_sens raises (sens needs per-(k, j) basis rows)."""
    from wlsqm_tpu.ops import pallas_fit

    assert pallas_fit.moment_vmem_ok(2, 4, 30)
    assert pallas_fit.moment_vmem_ok(3, 4, 48)  # packed store fits NO=35
    with pytest.raises(ValueError, match="sensitivities"):
        fit_pallas(jnp.zeros((TILE, 8, 2)), jnp.zeros((TILE, 8)),
                   jnp.full((TILE,), 8, jnp.int32), jnp.zeros((TILE, 2)),
                   dimension=2, order=2, weighting=defs.WEIGHT_UNIFORM,
                   do_sens=True, assembly="moments", interpret=True)
    # the dsts precision variant stays basic-only
    with pytest.raises(ValueError, match="basic algorithm"):
        fit_pallas(jnp.zeros((TILE, 8, 2)), jnp.zeros((TILE, 8)),
                   jnp.full((TILE,), 8, jnp.int32), jnp.zeros((TILE, 2)),
                   dimension=2, order=2, weighting=defs.WEIGHT_UNIFORM,
                   max_iter=3, precision="dsts", assembly="moments",
                   interpret=True)


def test_moment_gates():
    """Round-5 gate split: moment_auto_ok covers 3D order-4 (staged
    kernel, VMEM permitting) for forced/uncertified use, while
    moment_cert_ok keeps CERTIFIED routing on the swept 1D/2D family
    (the 3D moments-ds gate measured unsound — run_gate_check --3d)."""
    from wlsqm_tpu.ops import pallas_fit

    assert pallas_fit.moment_auto_ok(3, 4, 48)       # staged body
    assert pallas_fit.moment_auto_ok(3, 4, 64)       # still within VMEM
    assert not pallas_fit.moment_auto_ok(3, 4, 128)  # VMEM-excluded
    assert pallas_fit._moment_staged(3, 4)
    assert not pallas_fit._moment_staged(2, 4)
    assert pallas_fit.moment_cert_ok(2, 4, 30)
    assert not pallas_fit.moment_cert_ok(3, 4, 48)   # outside the family


@pytest.mark.full
def test_moment_iterative(rng):
    """ALGO_ITERATIVE on the moment body: the corrective refit is one
    packed-A refinement step (the normal-equations residual b - A x
    equals the projected data residual sum_k w r_k c_k algebraically);
    DOFs match the engine's iterative path and the rows kernel.
    Reference semantics: wlsqm/fitter/impl.pyx:986-1083."""
    xk, fk, nk, xi = _problem(rng, QB, K=14)
    com = dict(dimension=2, order=2, weighting=defs.WEIGHT_UNIFORM,
               interpret=True, tile_s=QTS, max_iter=4)
    fi_m, it_m = fit_pallas(xk, fk, nk, xi, assembly="moments", **com)
    NO = 6
    f64, _, _, _ = engine.fit_batch(
        xk, fk, nk, xi, jnp.zeros((QB, NO)),
        jnp.full((QB,), 2, jnp.int32), jnp.zeros((QB,), jnp.int64),
        jnp.full((QB,), defs.WEIGHT_UNIFORM, jnp.int32),
        dimension=2, NO=NO, iterative=True, max_iter=4)
    rel = np.abs(np.asarray(fi_m) - np.asarray(f64)).max() \
        / np.abs(np.asarray(f64)).max()
    assert rel < 5e-6, f"rel={rel:.2e}"
    it = np.asarray(it_m)
    assert it.min() >= 1 and it.max() <= 4
    # counts share the rows kernel's stagnation rule but round the norm
    # through a different evaluation order, so individual cases can
    # stagnate a step apart (the documented count-divergence class,
    # docs/porting.md; under CPU interpret the pair arithmetic is
    # additionally canary-degraded).  DOFs are the contract:
    fi_r, it_r = fit_pallas(xk, fk, nk, xi, assembly="rows", **com)
    assert np.asarray(it_r).min() >= 1 and np.asarray(it_r).max() <= 4
    rel_rm = (np.abs(np.asarray(fi_m) - np.asarray(fi_r)).max()
              / np.abs(np.asarray(fi_r)).max())
    assert rel_rm < 5e-6, f"rel={rel_rm:.2e}"


@pytest.mark.full
def test_moment_iterative_knowns(rng):
    """Iterative moments with a knowns bitmask: prescribed DOFs pass
    through bit-exactly and never receive corrections."""
    B, K = QB, 16
    knowns = int(defs.b2_F)
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.4, 0.4, (B, K, 2))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1])
    NO = wt.number_of_dofs(2, 2)
    gi = np.zeros((B, NO))
    gi[:, defs.i2_F] = np.sin(xi[:, 0]) * np.cos(xi[:, 1])
    args = (jnp.asarray(xk), jnp.asarray(fk),
            jnp.full((B,), K, jnp.int32), jnp.asarray(xi),
            jnp.asarray(gi))
    com = dict(dimension=2, order=2, weighting=defs.WEIGHT_CENTER,
               knowns=knowns, interpret=True, tile_s=QTS, max_iter=3)
    fi_m, _ = fit_pallas(*args, assembly="moments", **com)
    fi_m = np.asarray(fi_m)
    np.testing.assert_array_equal(fi_m[:, defs.i2_F], gi[:, defs.i2_F])
    f64, _, _, _ = engine.fit_batch(
        jnp.asarray(xk), jnp.asarray(fk), jnp.full((B,), K, jnp.int32),
        jnp.asarray(xi), jnp.asarray(gi),
        jnp.full((B,), 2, jnp.int32),
        jnp.full((B,), knowns, jnp.int64),
        jnp.full((B,), defs.WEIGHT_CENTER, jnp.int32),
        dimension=2, NO=NO, iterative=True, max_iter=3)
    un = [j for j in range(NO) if not (knowns >> j) & 1]
    f64 = np.asarray(f64)
    rel = (np.abs(fi_m[:, un] - f64[:, un]).max()
           / np.abs(f64[:, un]).max())
    assert rel < 5e-6, f"rel={rel:.2e}"


@pytest.mark.full
def test_moment_ts_variant(rng):
    """The ts (triple-single) arithmetic runs the moment body too."""
    B, K = QB, 24
    xi = rng.uniform(-1, 1, (B, 2))
    xk = xi[:, None, :] + rng.uniform(-0.3, 0.3, (B, K, 2))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., 1])
    args = (jnp.asarray(xk), jnp.asarray(fk),
            jnp.full((B,), K, jnp.int32), jnp.asarray(xi))
    com = dict(dimension=2, order=4, weighting=defs.WEIGHT_CENTER,
               interpret=True, precision="ts", tile_s=QTS)
    fi_m = np.asarray(fit_pallas(*args, assembly="moments", **com))
    f64 = _engine_oracle(*args, dimension=2, order=4,
                         weighting=defs.WEIGHT_CENTER)
    rel = np.abs(fi_m - f64).max() / np.abs(f64).max()
    assert rel < 5e-6, f"rel={rel:.2e}"


@pytest.mark.full
def test_moment_tile_s_bit_identity(rng):
    """Lane independence holds for the moment variant too."""
    xk, fk, nk, xi = _problem(rng, 2048, K=16)
    kw = dict(dimension=2, order=2, weighting=defs.WEIGHT_CENTER,
              interpret=True, assembly="moments")
    fi8 = fit_pallas(xk, fk, nk, xi, **kw)
    fi16 = fit_pallas(xk, fk, nk, xi, tile_s=16, **kw)
    np.testing.assert_array_equal(np.asarray(fi8), np.asarray(fi16))
