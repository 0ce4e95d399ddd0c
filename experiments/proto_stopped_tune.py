#!/usr/bin/env python3
"""Tile/unroll sweep + fwd/bwd split for the fused stopped-rollout
training kernel (round 5: chasing the 2x-over-scan target at the
elliptic d=50 BASELINE shape).

All cells back-to-back in ONE process (tunnel-jitter rule); marginal
two-point rates are not needed here because we compare cells against
each other, not against an absolute roofline.

Usage: python3 experiments/proto_stopped_tune.py [--smoke] [--K 262144]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pspde.utils import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--K", type=int, default=262144)
    ap.add_argument("--d", type=int, default=50)
    ap.add_argument("--N", type=int, default=20)
    args = ap.parse_args()
    enable_compilation_cache()

    from pspde.problems import ExponentialOnBallNonlinearSin
    from pspde.solvers import EllipticSolver
    from pspde.solvers._chunk import make_chunked_step

    K = 2048 if args.smoke else args.K
    d, N = args.d, args.N
    p = ExponentialOnBallNonlinearSin(d=d, alpha=0.1)

    def rate(tile, unroll, rng, spc=10, reps=3):
        s = EllipticSolver(
            p, "tune", loss_method="diffusion", K=K, N=N, delta_t=1e-3,
            lr=1e-3, L=1, verbose=False, rollout_mode="fused_train",
            fused_tile=tile, fused_unroll=unroll, fused_rng=rng)
        chunk = make_chunked_step(s._build_step(), spc)
        assert s.resolved_rollout_mode == "fused_train"
        # params/opt are DONATED (make_chunked_step donate_argnums) —
        # always rebind outputs, never re-call with a consumed tuple
        params, opt, key, aux = chunk(s.params, s.opt_state, s._train_key)
        jax.block_until_ready(params)
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            params, opt, key, aux = chunk(params, opt, key)
            jax.block_until_ready(params)
            best = max(best, K * N / ((time.perf_counter() - t0) / spc))
        return best

    out = {}
    cells = [(t, u, r)
             for t in (1024, 2048, 3200)
             for u in (1, 2)
             for r in ("binom",)]
    cells += [(3200, 1, "erfinv"), (2048, 4, "binom"), (1536, 4, "binom")]
    if args.smoke:
        cells = [(512, 1, "binom")]
    for t, u, r in cells:
        tag = f"t{t}_u{u}_{r}"
        try:
            v = rate(t, u, r)
            out[tag] = round(v / 1e6, 1)
        except Exception as e:
            out[tag] = repr(e)[:200]
        print(json.dumps({tag: out[tag]}), flush=True)

    # fwd/bwd split at the best cell: time the raw kernel forward alone,
    # then the full value_and_grad step, same process
    best_tag = max((k for k, v in out.items() if isinstance(v, float)),
                   key=lambda k: out[k], default=None)
    if best_tag:
        t, u, r = best_tag.split("_")
        t, u = int(t[1:]), int(u[1:])
        s = EllipticSolver(
            p, "split", loss_method="diffusion", K=K, N=N, delta_t=1e-3,
            lr=1e-3, L=1, verbose=False, rollout_mode="fused_train",
            fused_tile=t, fused_unroll=u, fused_rng=r)
        s._resolve_fused()
        run = s._build_fused_run()
        leaves = tuple(jax.tree.leaves(s.params))
        X0T = jnp.zeros((d, K), jnp.float32)
        zeros = jnp.zeros((K,), jnp.float32)

        # chunk 10 forward calls per dispatch: a single kernel call is
        # ~35 ms of which the tunnel dispatch is a large bias (the first
        # run of this script measured 148M "fwd-only" vs 131M full train
        # — an artifact of unchunked dispatch, not a cheap backward)
        from jax import lax

        reps_in = 10

        @jax.jit
        def fwd_chunk(lv, seed0):
            def body(c, i):
                o = run(lv, X0T, zeros, seed0 + i.astype(jnp.float32))
                return c + o.Y.sum(), None
            s_, _ = lax.scan(body, jnp.float32(0), jnp.arange(reps_in))
            return s_

        fwd_chunk(leaves, jnp.float32(0)).block_until_ready()
        best_rate = 0.0
        for g in range(3):
            t0 = time.perf_counter()
            fwd_chunk(leaves, jnp.float32(100 * g)).block_until_ready()
            best_rate = max(best_rate,
                            K * N * reps_in / (time.perf_counter() - t0))
        print(json.dumps({"fwd_only_Mps": round(best_rate / 1e6, 1),
                          "best": best_tag}), flush=True)


if __name__ == "__main__":
    main()
