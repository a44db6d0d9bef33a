import time, numpy as np
t0=time.time()
def log(m): print("%6.1fs %s" % (time.time()-t0, m), flush=True)
import jax, jax.numpy as jnp
from wlsqm_tpu.ops import gather
log("devices %s" % jax.devices())
rng = np.random.default_rng(0)
n, B, K = 5000, 256, 16
base = rng.integers(0, n, B); base.sort()
idx = np.clip(base[:, None] + rng.integers(-40, 40, (B, K)), 0, n-1).astype(np.int32)
plan = gather.plan_window_gather(idx, n)
log("plan nblk=%d bad=%d" % (plan.nblk, len(plan.bad_blocks)))
u = rng.standard_normal(n)
out = np.asarray(gather.gather_rows(u, idx, plan))
log("f64 1d maxdiff=%.3e (pair floor ~3.6e-15)" % np.abs(out-u[idx]).max())
assert np.abs(out-u[idx]).max() < 1e-14
uf = rng.standard_normal((n, 3)).astype(np.float32)
outf = np.asarray(gather.gather_rows(uf, idx, plan))
log("f32 multi exact=%s" % np.array_equal(outf, uf[idx]))
u8 = rng.standard_normal((n, 8))
out8 = np.asarray(gather.gather_rows(u8, idx, plan))
log("f64 F=8 maxdiff=%.3e" % np.abs(out8-u8[idx]).max())
import time as _t
# timing vs XLA gather on a big cloud
import jax
nb, Kb = 20480, 28
bb = rng.integers(0, nb, nb); bb.sort()
idxb = np.clip(bb[:, None] + rng.integers(-300, 300, (nb, Kb)), 0, nb-1).astype(np.int32)
planb = gather.plan_window_gather(idxb, nb)
log("big plan coverage=%.3f" % planb.coverage)
ub = jnp.asarray(rng.standard_normal(nb))
idxb_d = jnp.asarray(idxb)
jit_win = jax.jit(lambda u: gather.gather_rows(u, idxb_d, planb).sum())
jit_xla = jax.jit(lambda u: u[idxb_d].sum())
for name, fn in (("window", jit_win), ("xla", jit_xla)):
    float(fn(ub))
    best = np.inf
    for _ in range(5):
        t0 = _t.perf_counter(); float(fn(ub)); best = min(best, _t.perf_counter()-t0)
    log("%s gather: %.3f ms (%.1f M idx/s)" % (name, best*1e3, nb*Kb/best/1e6))
