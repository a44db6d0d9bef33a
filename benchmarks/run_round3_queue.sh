#!/usr/bin/env bash
# TPU measurements queued behind the axon relay outage (late round 3).
#
# Runs each item sequentially (the remote bridge tolerates ONE client
# process at a time — never run these in parallel), logging to
# benchmarks/logs/.  Safe to re-run; each item is independent.
#
# Usage:  benchmarks/run_round3_queue.sh [item ...]
#   items: bench tile adjoint euler   (default: all)
set -uo pipefail

REPO="$(cd "$(dirname "$0")/.." && pwd)"
cd "$REPO"
mkdir -p benchmarks/logs

# refuse to hang: the first jax call blocks forever when the relay is down
python - <<'EOF' || { echo "relay down; aborting" >&2; exit 1; }
import os, socket, sys
if os.environ.get("PALLAS_AXON_POOL_IPS"):
    try:
        socket.create_connection(("127.0.0.1", 8083), timeout=5).close()
    except OSError:
        sys.exit(1)
EOF

ITEMS=("$@")
[ ${#ITEMS[@]} -eq 0 ] && ITEMS=(bench tile adjoint euler iterparity)

for item in "${ITEMS[@]}"; do
  case "$item" in
    bench)
      echo "=== bench.py (headline) ==="
      timeout 3600 python bench.py 2> benchmarks/logs/bench_stderr.log \
        | tee benchmarks/logs/bench.json ;;
    tile)
      echo "=== tile_s ILP sweep ==="
      timeout 3600 python benchmarks/run_tile_sweep.py \
        2>&1 | tee benchmarks/logs/tile_sweep.log ;;
    adjoint)
      echo "=== kernel-adjoint drive (fit_pallas_diffable timing) ==="
      timeout 3600 python - 2>&1 <<'EOF' | tee benchmarks/logs/kernel_adjoint.log
import time
import numpy as np
import jax, jax.numpy as jnp
import wlsqm_tpu  # noqa: F401
from wlsqm_tpu.fitter import defs
from wlsqm_tpu.ops.pallas_fit import fit_pallas_diffable, fit_pallas

print("device:", jax.devices()[0], flush=True)
B, K = 32768, 30
key = jax.random.PRNGKey(0)
xk = jax.random.uniform(key, (B, K, 2), jnp.float64, -1.0, 1.0)
fk = jnp.sin(3.0 * xk[..., 0]) * jnp.cos(2.0 * xk[..., 1])
nk = jnp.full((B,), K, jnp.int32)
xi = jnp.zeros((B, 2))
kw = dict(dimension=2, order=4, weighting=defs.WEIGHT_CENTER)

def loss(fk):
    fi = fit_pallas_diffable(xk, fk, nk, xi, **kw)
    return (fi ** 2).sum()

g = jax.jit(jax.grad(loss))
t0 = time.perf_counter(); gv = g(fk); gv.block_until_ready()
print("compile+first grad: %.1f s" % (time.perf_counter() - t0), flush=True)
times = []
for _ in range(3):
    t0 = time.perf_counter(); g(fk).block_until_ready()
    times.append(time.perf_counter() - t0)
dt = min(times)
print("grad step: %.4f s -> %.2f M case-grads/s" % (dt, B / dt / 1e6))
# forward-only for the ratio
f = jax.jit(lambda fk: fit_pallas(xk, fk, nk, xi, **kw).sum())
float(f(fk))
t0 = time.perf_counter(); float(f(fk)); dtf = time.perf_counter() - t0
print("forward step: %.4f s; backward/forward ratio: %.2f" % (dtf, dt / dtf))
# parity of the VJP vs the engine jacobian on a small slice
from wlsqm_tpu.fitter import engine
NO = defs.number_of_dofs(2, 4)
sl = slice(0, 1024)
args = (xk[sl], fk[sl], nk[sl], xi[sl], jnp.zeros((1024, NO)),
        jnp.full((1024,), 4, jnp.int32), jnp.zeros((1024,), jnp.int64),
        jnp.full((1024,), defs.WEIGHT_CENTER, jnp.int32))
fi64, s64, _, _ = engine.fit_batch(*args, dimension=2, NO=NO,
                                   precision="f64", do_sens=True)
_, vjp = jax.vjp(lambda fk_: fit_pallas_diffable(xk[sl], fk_, nk[sl],
                                                 xi[sl], **kw), fk[sl])
ct = jnp.ones((1024, NO))
got = np.asarray(vjp(ct)[0])
want = np.asarray(jnp.einsum("bkj,bj->bk", jnp.nan_to_num(s64), ct))
rel = np.abs(got - want).max() / max(np.abs(want).max(), 1e-30)
print("VJP vs f64-engine sens einsum (rel L-inf): %.3e" % rel)
EOF
      ;;
    euler)
      echo "=== Euler vortex application timing ==="
      timeout 3600 python - 2>&1 <<'EOF' | tee benchmarks/logs/euler_tpu.log
import time
import numpy as np
import jax
import wlsqm_tpu  # noqa: F401
print("device:", jax.devices()[0], flush=True)
import runpy
t0 = time.perf_counter()
runpy.run_path("examples/euler_flow.py", run_name="__main__")
print("total wall (compile + run): %.1f s" % (time.perf_counter() - t0))
EOF
      ;;
    iterparity)
      echo "=== extended iteration-count parity (JSON) ==="
      timeout 3600 python benchmarks/run_iteration_parity.py \
        2>&1 | tee benchmarks/logs/iteration_parity.log ;;
    *) echo "unknown item: $item" >&2; exit 2 ;;
  esac
done
