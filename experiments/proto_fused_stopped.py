#!/usr/bin/env python3
"""Measure the fused stopped-rollout training kernel (VERDICT r4 item 1)
against the round-4 dk+rbg scan on the BASELINE elliptic d=50 config.

Grid: {dk+rbg scan, fused_train, fused_train+binom} x K in {8192, 65536,
262144}; ExponentialOnBallNonlinearSin d=50, N=20, diffusion loss — the
same cells as experiments/proto_stopped_layout.py (r4 best: 104.7M /
107.8M path-steps/s at K=8192 / 65536).  Plus a convergence drive:
2000 iters fused vs scan, fresh-sample test L2 must land in the same
band.

Usage: python3 experiments/proto_fused_stopped.py [--smoke] [--no-conv]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

from pspde.utils import enable_compilation_cache


def make_solver(d, K, N, mode, **kw):
    from pspde.problems import ExponentialOnBallNonlinearSin
    from pspde.solvers import EllipticSolver
    p = ExponentialOnBallNonlinearSin(d=d, alpha=0.1)
    skw = dict(loss_method="diffusion", K=K, N=N, delta_t=1e-3, lr=1e-3,
               L=1, verbose=False)
    if mode == "dk_rbg":
        skw.update(rng_impl="rbg", layout="dk")
    elif mode == "fused":
        skw.update(rollout_mode="fused_train")
    elif mode == "fused_binom":
        skw.update(rollout_mode="fused_train", fused_rng="binom")
    else:
        raise ValueError(mode)
    skw.update(kw)
    return EllipticSolver(p, "proto-fused-stop", **skw)


def measure(d, K, N, mode, steps_per_call=20, n_chunks=3):
    from pspde.solvers._chunk import make_chunked_step
    s = make_solver(d, K, N, mode)
    chunk = make_chunked_step(s._build_step(), steps_per_call)
    if mode.startswith("fused"):
        assert s.resolved_rollout_mode == "fused_train", \
            s.resolved_rollout_mode
    params, opt_state, key = s.params, s.opt_state, s._train_key
    params, opt_state, key, aux = chunk(params, opt_state, key)  # compile
    jax.block_until_ready(aux["loss"])
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)
    return {"iter_ms": 1e3 * dt_iter,
            "path_steps_per_sec": K * N / dt_iter,
            "loss": float(aux["loss"][-1] if hasattr(aux["loss"], "ndim")
                          and aux["loss"].ndim else aux["loss"])}


def converge(d, K, N, mode, L):
    s = make_solver(d, K, N, mode, L=L, K_test_log=4096, print_every=10**9)
    t0 = time.perf_counter()
    s.train()
    import numpy as np
    tail = float(np.mean(s.V_test_L2[-50:]))
    return {"test_L2_tail": tail, "loss_final": float(s.loss_log[-1]),
            "wall_s": time.perf_counter() - t0,
            "resolved": getattr(s, "resolved_rollout_mode", "scan")}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--no-conv", action="store_true")
    ap.add_argument("--d", type=int, default=50)
    ap.add_argument("--N", type=int, default=20)
    args = ap.parse_args()
    enable_compilation_cache()

    Ks = [512] if args.smoke else [8192, 65536, 262144]
    spc = {512: 10, 8192: 50, 65536: 20, 262144: 10}
    out = {}
    for K in Ks:
        for mode in ("dk_rbg", "fused", "fused_binom"):
            tag = f"K{K}_{mode}"
            try:
                r = measure(args.d, K, args.N, mode, steps_per_call=spc[K])
            except Exception as e:
                r = {"error": repr(e)[:300]}
            out[tag] = r
            print(json.dumps({tag: r}), flush=True)
    for K in Ks:
        base = out[f"K{K}_dk_rbg"].get("path_steps_per_sec")
        best = max((out[f"K{K}_{m}"].get("path_steps_per_sec", 0)
                    for m in ("fused", "fused_binom")), default=0)
        if base and best:
            print(json.dumps({f"K{K}_fused_vs_scan": round(best / base, 2)}),
                  flush=True)

    if not args.no_conv:
        L = 100 if args.smoke else 2000
        Kc = 512 if args.smoke else 8192
        for mode in ("dk_rbg", "fused"):
            r = converge(args.d, Kc, args.N, mode, L)
            print(json.dumps({f"conv_{mode}": r}), flush=True)


if __name__ == "__main__":
    main()
