"""Pre-compilation of the fused kernels: make the Mosaic cliff a managed cost.

The fused Pallas kernel compiles per static configuration (dimension,
order, K, weighting, knowns, arithmetic, assembly, sweep count, batch
tile).  Cold compiles range from ~25 s (2D order 4) to minutes for the
big 3D unrolls (measured table: benchmarks/README.md "compile times"),
which surprises users whose first production call eats the cliff.  This
module pre-compiles a declared set of configurations up front — at
service start, in a deploy step, or in CI — so every later call hits
the in-process jit cache (and, with ``WLSQM_TPU_COMPILE_CACHE`` set,
the persistent XLA cache across processes).

Typical use::

    import wlsqm_tpu as wt

    reports = wt.warmup([
        dict(dimension=2, order=4, K=30, weighting=wt.WEIGHT_CENTER),
        dict(dimension=3, order=4, K=48, weighting=wt.WEIGHT_CENTER,
             assembly="rows"),
    ])
    # -> [{'config': ..., 'compile_s': 24.8, 'cached': False}, ...]

A config may also carry a precomputed :class:`wlsqm_tpu.api.FitPlan`
(``plan=``) or representative geometry (``xk=``, ``xi=``, ``nk=``) from
which the production routing decision is planned and THAT route is
warmed — otherwise the kernel is warmed for the explicitly given
``precision`` / ``assembly`` / ``refine_steps``.

The reference has no counterpart (Cython extensions are compiled at
install time; reference: setup via meson-python) — pre-compilation is
the TPU-native analogue of shipping compiled binaries.
"""

from __future__ import annotations

import time

import numpy as np

__all__ = ["warmup", "DEFAULT_CONFIGS"]

#: the benchmark-suite configurations (headline, iterative, sens, 3D).
#: The last entry warms the staged 3D moment body the dim3 benchmark row
#: (and direct fit_pallas callers) hit — its ~2 min Mosaic compile is
#: the largest cliff in the suite; the plain 3D entry warms the
#: CERTIFIED route auto users get (rows-ts — see moment_cert_ok).
DEFAULT_CONFIGS = (
    dict(dimension=2, order=4, K=30),
    dict(dimension=2, order=4, K=30, iterative=True),
    dict(dimension=2, order=4, K=30, do_sens=True),
    dict(dimension=3, order=4, K=48),
    dict(dimension=3, order=4, K=48, assembly="moments"),
)


def _representative_cloud(rng, B, K, dimension):
    """A well-conditioned random cloud for planning/compiling."""
    xi = rng.uniform(-1.0, 1.0, (B, dimension))
    xk = xi[:, None, :] + rng.uniform(-0.5, 0.5, (B, K, dimension))
    fk = np.sin(xk[..., 0]) * np.cos(xk[..., -1])
    return xk, fk, xi


def warmup(configs=DEFAULT_CONFIGS, *, verbose: bool = False) -> list[dict]:
    """Compile the fused kernel (and routing plan) for each configuration.

    Each config is a dict with keys:

    dimension (required), order (default 2), K (required unless ``xk``
    given), weighting (default WEIGHT_CENTER), knowns (default 0),
    do_sens / iterative / max_iter (defaults off), tile_s,
    precision ("ds"/"ts"), assembly ("auto"/"rows"/"moments"),
    refine_steps — kernel statics, used when no plan/geometry is given;
    plan (a :class:`wlsqm_tpu.api.FitPlan`) or xk/xi/nk (representative
    geometry) — warm the route production would take instead.

    Returns one report dict per config: ``config`` (echo), ``route``
    (the warmed route, str), ``compile_s`` (first-call wall time) and
    ``run_s`` (second-call wall time — the steady-state cost; a
    ``compile_s`` close to ``run_s`` means the persistent cache already
    held the program).  Configs the kernel cannot take are warmed
    through the engine path and flagged ``path="xla"``.
    """
    import jax.numpy as jnp

    from wlsqm_tpu import api
    from wlsqm_tpu.fitter import defs
    from wlsqm_tpu.ops import pallas_fit

    rng = np.random.default_rng(0)
    reports = []
    for cfg in configs:
        cfg = dict(cfg)
        dimension = int(cfg.get("dimension", 2))
        order = int(cfg.get("order", 2))
        weighting = int(cfg.get("weighting", defs.WEIGHT_CENTER))
        knowns = int(cfg.get("knowns", 0))
        do_sens = bool(cfg.get("do_sens", False))
        iterative = bool(cfg.get("iterative", False))
        max_iter = int(cfg.get("max_iter", 10))
        tile_s = cfg.get("tile_s")
        B = (tile_s or pallas_fit.TILE_S) * pallas_fit.TILE_L

        if cfg.get("xk") is not None:
            xk = np.asarray(cfg["xk"], np.float64)
            if xk.ndim == 2:
                xk = xk[:, :, None]
            K = xk.shape[1]
            xi = (np.asarray(cfg["xi"], np.float64)
                  if cfg.get("xi") is not None
                  else np.zeros((xk.shape[0], dimension)))
            nk = cfg.get("nk")
            fk = np.sin(xk[..., 0]) * np.cos(xk[..., -1])
            if xk.shape[0] < B:
                reps = -(-B // xk.shape[0])
                xk, fk, xi = (np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:B]
                              for a in (xk, fk, xi))
                nk = None if nk is None else np.tile(np.asarray(nk), reps)[:B]
        else:
            K = int(cfg["K"])
            xk, fk, xi = _representative_cloud(rng, B, K, dimension)
            nk = None

        plan = cfg.get("plan")
        explicit = any(cfg.get(k) is not None
                       for k in ("precision", "assembly", "refine_steps"))
        if plan is None and not explicit:
            plan = api.plan_fit_many(
                xk, xi, nk=nk, order=order, knowns=knowns,
                weighting=weighting, do_sens=do_sens, iterative=iterative)

        t0 = time.perf_counter()
        if plan is not None:
            api.fit_many(jnp.asarray(xk), jnp.asarray(fk), jnp.asarray(xi),
                         nk=None if nk is None else jnp.asarray(nk),
                         order=order, knowns=knowns, weighting=weighting,
                         do_sens=do_sens, iterative=iterative,
                         max_iter=max_iter, plan=plan
                         ).fi.block_until_ready()
            route = str(plan)
            path = plan.route.path

            def again():
                api.fit_many(jnp.asarray(xk), jnp.asarray(fk),
                             jnp.asarray(xi),
                             nk=None if nk is None else jnp.asarray(nk),
                             order=order, knowns=knowns, weighting=weighting,
                             do_sens=do_sens, iterative=iterative,
                             max_iter=max_iter, plan=plan
                             ).fi.block_until_ready()
        else:
            import jax

            kw = dict(dimension=dimension, order=order, weighting=weighting,
                      knowns=knowns, do_sens=do_sens,
                      max_iter=max_iter if iterative else 0,
                      precision=cfg.get("precision", "ds"),
                      assembly=cfg.get("assembly", "auto"),
                      interpret=jax.default_backend() == "cpu")
            if cfg.get("refine_steps") is not None:
                kw["refine_steps"] = int(cfg["refine_steps"])
            if tile_s is not None:
                kw["tile_s"] = int(tile_s)
            nk_j = jnp.full((B,), K, jnp.int32)

            def run():
                out = pallas_fit.fit_pallas_jit(
                    jnp.asarray(xk), jnp.asarray(fk), nk_j, jnp.asarray(xi),
                    **kw)
                (out[0] if isinstance(out, tuple) else out
                 ).block_until_ready()

            run()
            route = "kernel(%s, %s)" % (kw["precision"], kw["assembly"])
            path = "kernel"
            again = run
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        again()
        run_s = time.perf_counter() - t0
        rep = dict(config={k: v for k, v in cfg.items()
                           if k not in ("xk", "xi", "nk", "plan")},
                   route=route, path=path,
                   compile_s=round(compile_s, 2), run_s=round(run_s, 3),
                   cached=compile_s < 3 * run_s + 1.0)
        reports.append(rep)
        if verbose:
            print("warmup %-60s %7.1fs (steady %.3fs)"
                  % (route, compile_s, run_s), flush=True)
    return reports


def main() -> None:  # pragma: no cover - thin CLI
    import argparse
    import json

    ap = argparse.ArgumentParser(
        description="Pre-compile the wlsqm_tpu fused kernels "
                    "(set WLSQM_TPU_COMPILE_CACHE to persist)")
    ap.add_argument("--configs", default=None,
                    help="path to a JSON list of config dicts "
                         "(default: the benchmark-suite set)")
    args = ap.parse_args()
    configs = DEFAULT_CONFIGS
    if args.configs:
        with open(args.configs) as f:
            configs = json.load(f)
    print(json.dumps(warmup(configs, verbose=True), indent=1))


if __name__ == "__main__":  # pragma: no cover
    main()
