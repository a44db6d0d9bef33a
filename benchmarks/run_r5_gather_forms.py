"""Which formulation of the tail-compaction gather is fast on this TPU?

The split route needs, inside one jit program: gather ~5k data-dependent
case rows out of a 32k-case chunk (payload ~93 f64 per case), and
scatter ~5k result rows (15 f64) back.  The naive ``a[idx]`` costs
~2.6 ms (r5_split_ablate).  Candidates, all exactness-preserving:

  rowmajor   xk[idx], fk[idx], xi[idx], nk[idx] (the current form)
  packed64   one (B, 93) f64 payload, one take
  packed32   (B, 186) f32 planes, one take
  featmajor  (186, B) f32 planes, take along lanes (axis=1)
  onehot     blocked one-hot MXU matmul over (B-block) tiles, f32 planes
  scatter64  fi.at[idx].set(rows) baseline for the write-back
  scatter_oh one-hot scatter: P^T @ rows via MXU + select

Writes benchmarks/r5_gather_forms.json.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    from bench import _axon_relay_preflight

    if not _axon_relay_preflight(120):
        log("relay down")
        sys.exit(2)

    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    out = {"device": str(jax.devices()[0])}
    B, K, F = 32768, 30, 93       # payload: xk 60 + fk 30 + xi 2 + nk 1
    KQ = 5120                     # tail window (TILE-padded 15%)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    pay64 = jax.random.uniform(k1, (B, F), jnp.float64)
    hi = pay64.astype(jnp.float32)
    lo = (pay64 - hi.astype(jnp.float64)).astype(jnp.float32)
    pay32 = jnp.concatenate([hi, lo], axis=1)           # (B, 186)
    payfm = pay32.T                                      # (186, B)
    xk = pay64[:, :60].reshape(B, K, 2)
    fk = pay64[:, 60:90]
    # a data-dependent index set like the split's: ~15% scattered rows
    bad = jax.random.uniform(k2, (B,)) < 0.147
    (idx,) = jnp.nonzero(np.asarray(bad), size=KQ, fill_value=B)
    idx = jnp.minimum(idx, B - 1)
    rows15 = jax.random.uniform(k2, (KQ, 15), jnp.float64)
    fi = jnp.zeros((B, 15), jnp.float64)
    jax.block_until_ready((pay64, pay32, payfm, idx, rows15, fi))

    def measure(fn, label, *args, reps=5, steps=64):
        # per-step index arrays ride the scan as xs — without this the
        # gather is loop-invariant and XLA hoists it out of the loop
        # (first run of this script measured every form at ~0.4 ms flat)
        idxs = jnp.stack([jnp.roll(idx, 17 * s) for s in range(steps)])

        @jax.jit
        def sweep(*a):
            def step(acc, ix):
                return acc + fn(*a, ix), None
            acc, _ = jax.lax.scan(step, jnp.float64(0.0), idxs)
            return acc
        t0 = time.perf_counter()
        float(sweep(*args))
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(sweep(*args))
            ts.append(time.perf_counter() - t0)
        ts.sort()
        ms = ts[len(ts) // 2] / steps * 1e3
        log("%-10s %8.3f ms (compile %.0fs, spread %.0f%%)"
            % (label, ms, comp, 100 * (ts[-1] - ts[0]) / ts[len(ts) // 2]))
        out[label] = round(ms, 4)
        return ms

    measure(lambda xk, fk, idx: xk[idx].sum() + fk[idx].sum(),
            "rowmajor", xk, fk)
    measure(lambda p, idx: p[idx].sum(), "packed64", pay64)
    measure(lambda p, idx: p[idx].sum().astype(jnp.float64),
            "packed32", pay32)
    measure(lambda p, idx: p[:, idx].sum().astype(jnp.float64),
            "featmajor", payfm)
    measure(lambda p, idx: jnp.take(p, idx, axis=0,
                                    unique_indices=True).sum()
            .astype(jnp.float64),
            "packed32_u", pay32)

    def onehot(p, idx):
        # blocked one-hot: (KQ, Bb) @ (Bb, 186) accumulated over B blocks;
        # selection by a 0/1 f32 matrix is exact on the MXU's f32 path
        BB = 4096
        acc = jnp.zeros((KQ, p.shape[1]), jnp.float32)
        for s in range(0, B, BB):
            oh = (idx[:, None] == (s + jnp.arange(BB))[None, :])
            acc = acc + jax.lax.dot(
                oh.astype(jnp.float32), p[s:s + BB],
                precision=jax.lax.Precision.HIGHEST)
        return acc.sum().astype(jnp.float64)

    measure(onehot, "onehot", pay32)

    measure(lambda fi, r, idx: fi.at[idx].set(r, mode="drop").sum(),
            "scatter64", fi, rows15)

    def scatter_oh(fi, idx, r):
        # one-hot transpose scatter: P^T (B, KQ) @ rows (KQ, 15)
        hi = r.astype(jnp.float32)
        lo = (r - hi.astype(jnp.float64)).astype(jnp.float32)
        oh = (idx[None, :] == jnp.arange(B)[:, None]).astype(jnp.float32)
        shi = jax.lax.dot(oh, hi, precision=jax.lax.Precision.HIGHEST)
        slo = jax.lax.dot(oh, lo, precision=jax.lax.Precision.HIGHEST)
        hit = oh.sum(axis=1) > 0
        return jnp.where(hit[:, None],
                         shi.astype(jnp.float64) + slo.astype(jnp.float64),
                         fi).sum()

    measure(lambda fi, r, idx: scatter_oh(fi, idx, r),
            "scatter_oh", fi, rows15)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "r5_gather_forms.json")
    with open(path, "w") as f:
        json.dump(out, f)
    log("wrote %s" % path)


if __name__ == "__main__":
    main()
