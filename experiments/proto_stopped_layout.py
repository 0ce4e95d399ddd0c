#!/usr/bin/env python3
"""Measure the layout='dk' + rng_impl='rbg' levers on the STOPPED
(elliptic) rollout — VERDICT r3 item 6.

The round-3 study measured 1.6x from the transposed K-in-lanes layout +
hardware PRNG on the HJB scan (experiments/proto_transposed_layout.py);
this prototype measures the same two levers on the elliptic stopped
rollout (rollout/sde.py: stopped_rollout_dk), whose hot loop differs in
two ways: the control is a vjp through the value net (2x the matmuls,
solver.py:725-729) and the masking algebra adds per-step (K,) boolean
work.

Grid: {threefry, rbg} x {kd, dk} x K in {200 (reference config),
8192, 65536}; d=50 ExponentialOnBallNonlinearSin, N=20 (BASELINE
elliptic d=50 config).  Prints one JSON line per cell plus a summary.

Usage: python3 experiments/proto_stopped_layout.py [--smoke]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from pspde.utils import enable_compilation_cache


def measure(d, K, N, rng_impl, layout, steps_per_call=20, n_chunks=3,
            L_warm=1):
    from pspde.problems import ExponentialOnBallNonlinearSin
    from pspde.solvers import EllipticSolver
    from pspde.solvers._chunk import make_chunked_step

    p = ExponentialOnBallNonlinearSin(d=d, alpha=0.1)
    s = EllipticSolver(p, "proto-stop", loss_method="diffusion", K=K, N=N,
                       delta_t=1e-3, lr=1e-3, L=1, verbose=False,
                       rng_impl=rng_impl, layout=layout)
    chunk = make_chunked_step(s._build_step(), steps_per_call)
    assert layout == "kd" or s.resolved_layout == "dk", s.resolved_layout
    params, opt_state, key = s.params, s.opt_state, s._train_key
    params, opt_state, key, aux = chunk(params, opt_state, key)  # compile
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)
    return {"iter_ms": 1e3 * dt_iter, "path_steps_per_sec": K * N / dt_iter,
            "resolved_layout": s.resolved_layout}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--d", type=int, default=50)
    ap.add_argument("--N", type=int, default=20)
    args = ap.parse_args()
    enable_compilation_cache()

    Ks = [512] if args.smoke else [200, 8192, 65536]
    spc = {200: 100, 512: 10, 8192: 50, 65536: 20}
    out = {}
    for K in Ks:
        for rng_impl in ("threefry", "rbg"):
            for layout in ("kd", "dk"):
                tag = f"K{K}_{rng_impl}_{layout}"
                try:
                    r = measure(args.d, K, args.N, rng_impl, layout,
                                steps_per_call=spc[K])
                except Exception as e:
                    r = {"error": repr(e)[:200]}
                out[tag] = r
                print(json.dumps({tag: r}), flush=True)
    # summary: best vs baseline per K
    for K in Ks:
        base = out[f"K{K}_threefry_kd"].get("path_steps_per_sec")
        best_tag = max((t for t in out if t.startswith(f"K{K}_")
                        and "path_steps_per_sec" in out[t]),
                       key=lambda t: out[t]["path_steps_per_sec"])
        best = out[best_tag]["path_steps_per_sec"]
        print(json.dumps({"K": K, "baseline_kd_threefry": base,
                          "best": best, "best_tag": best_tag,
                          "speedup": None if not base else
                          round(best / base, 3)}), flush=True)


if __name__ == "__main__":
    main()
