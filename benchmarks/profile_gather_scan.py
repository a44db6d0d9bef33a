import time, numpy as np
t0=time.time()
def log(m): print("%6.1fs %s" % (time.time()-t0, m), flush=True)
import jax, jax.numpy as jnp
from wlsqm_tpu.ops import gather
from wlsqm_tpu.utils import neighbors
rng = np.random.default_rng(42)
n, k = 20480, 28
pts = rng.uniform(0.0, 1.0, (n, 2))
pts = pts[gather.morton_order(pts)]
idx_np, _ = neighbors.knn(pts, pts, k + 1, backend="host")
idx_np = np.asarray(idx_np)[:, 1:].astype(np.int32)
idx = jnp.asarray(idx_np)
u = jnp.asarray(np.sin(pts[:, 0]))
STEPS = 50

def timed_scan(fn):
    @jax.jit
    def scan(u):
        def step(c, _):
            return c + fn(u).sum(), None
        c, _ = jax.lax.scan(step, jnp.float64(0.0), None, length=STEPS)
        return c
    float(scan(u))
    best = np.inf
    for _ in range(3):
        t1 = time.perf_counter(); float(scan(u)); best = min(best, time.perf_counter()-t1)
    return best / STEPS * 1e3

log("xla gather-only: %.2f ms/step" % timed_scan(lambda u: u[idx]))
for T, W in ((16, 1024), (32, 1024), (16, 512), (64, 1024)):
    plan = gather.plan_window_gather(idx_np, n, block_t=T, window=W)
    if plan is None:
        log("T=%d W=%d: plan overflow" % (T, W)); continue
    ms = timed_scan(lambda u, p=plan: gather.gather_rows(u, idx, p))
    log("window T=%d W=%d cov=%.3f: %.2f ms/step" % (T, W, plan.coverage, ms))
