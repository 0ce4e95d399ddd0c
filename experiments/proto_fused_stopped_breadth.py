#!/usr/bin/env python3
"""Breadth measurement for the fused stopped-rollout training engine
(round 5): beyond the elliptic d=50 headline cell, measure the OTHER
reference workloads that run the stopped loop —

  gen50   GeneralSolver, manufactured nonlinear parabolic d=50
          (time-stopping branch of the kernel)
  com10   Committor d=10 (small-d, sphere-exit geometry)
  ac100   Allen-Cahn d=100 (the reference's flagship d=100 elliptic-
          family experiment; radius-7 ball)

each as (dk+rbg scan) vs (fused_train) chunked rates at K=65536, plus
two convergence legs: elliptic d=50 fused_rng='binom' (does the
moment-matched noise hold for EXIT-TIME statistics?) and the general
parabolic fused vs scan.

Usage: python3 experiments/proto_fused_stopped_breadth.py [--smoke]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import numpy as np

from pspde.utils import enable_compilation_cache


def rate_of(s, K, N, spc=20, reps=3):
    from pspde.solvers._chunk import make_chunked_step
    chunk = make_chunked_step(s._build_step(), spc)
    params, opt, key, aux = chunk(s.params, s.opt_state, s._train_key)
    jax.block_until_ready(aux["loss"])
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        # donated args: rebind; block on the aux scalar chain (the
        # first version of this script blocked on params only and read
        # a 1000x-too-fast rate — see the log note below)
        params, opt, key, aux = chunk(params, opt, key)
        jax.block_until_ready(aux["loss"])
        best = max(best, K * N / ((time.perf_counter() - t0) / spc))
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--perf-only", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    from pspde.problems import (AllenCahn, Committor,
                                ExponentialOnBallNonlinearSin,
                                ExponentialOnSphereNonlinearParabolic)
    from pspde.solvers import EllipticSolver, GeneralSolver

    K = 2048 if args.smoke else 65536
    cells = [
        ("gen50", GeneralSolver,
         ExponentialOnSphereNonlinearParabolic(d=50), dict(N=20)),
        ("com10", EllipticSolver, Committor(d=10), dict(N=25)),
        ("ac100", EllipticSolver, AllenCahn(d=100), dict(N=20)),
    ]
    for tag, cls, p, extra in cells:
        N = extra["N"]
        for mode, kw in [("scan_dk_rbg", dict(rng_impl="rbg",
                                              layout="dk")),
                         ("fused", dict(rollout_mode="fused_train"))]:
            try:
                s = cls(p, f"{tag}-{mode}", loss_method="diffusion",
                        K=K, N=N, delta_t=1e-3, lr=1e-3, L=1,
                        verbose=False, **kw)
                r = rate_of(s, K, N)
                resolved = getattr(s, "resolved_rollout_mode", "scan")
                if mode == "fused" and resolved != "fused_train":
                    out = {"skipped": f"fell back to {resolved}"}
                else:
                    out = {"Mps": round(r / 1e6, 1),
                           "resolved": resolved,
                           "layout": getattr(s, "resolved_layout", "?")}
            except Exception as e:
                out = {"error": repr(e)[:200]}
            print(json.dumps({f"{tag}_{mode}": out}), flush=True)

    # convergence legs
    if args.perf_only:
        return
    L = 100 if args.smoke else 2000
    Kc = 512 if args.smoke else 8192
    p50 = ExponentialOnBallNonlinearSin(d=50, alpha=0.1)
    e = EllipticSolver(p50, "conv-binom", loss_method="diffusion", K=Kc,
                       N=20, delta_t=1e-3, lr=1e-3, L=L, K_test_log=4096,
                       verbose=False, rollout_mode="fused_train",
                       fused_rng="binom", print_every=10**9)
    t0 = time.perf_counter()
    e.train()
    print(json.dumps({"conv_elliptic_fused_binom": {
        "resolved": e.resolved_rollout_mode,
        "test_L2_tail": float(np.mean(e.V_test_L2[-50:])),
        "wall_s": round(time.perf_counter() - t0, 1)}}), flush=True)

    pg = ExponentialOnSphereNonlinearParabolic(d=50)
    for mode, kw in [("scan", {}), ("fused", dict(
            rollout_mode="fused_train"))]:
        g = GeneralSolver(pg, f"conv-gen-{mode}", loss_method="diffusion",
                          K=Kc, N=20, delta_t=1e-3, lr=1e-3, L=L,
                          K_test_log=4096, verbose=False,
                          print_every=10**9, **kw)
        t0 = time.perf_counter()
        g.train()
        print(json.dumps({f"conv_general_{mode}": {
            "resolved": getattr(g, "resolved_rollout_mode", "scan"),
            "test_L2_tail": float(np.mean(g.V_test_L2[-50:])),
            "wall_s": round(time.perf_counter() - t0, 1)}}), flush=True)


if __name__ == "__main__":
    main()
