#!/usr/bin/env python3
"""Reference-config wall-clocks with DEFAULTS ONLY (VERDICT r4 item 6):
the auto levers (layout='auto', steps_per_call='auto') must deliver the
measured-safe speedups without the user touching a single perf kwarg.

Three reference-shaped cells, each timed as (r4 defaults: kd / spc=1)
vs (r5 defaults: auto) in ONE process:

  A. elliptic Dirichlet at the reference's OWN scale (K=200, d=50,
     N=20) — dispatch-bound: auto spc chunking is the lever
  B. elliptic Dirichlet at K=8192 (the BASELINE-scale run) — lane-bound:
     auto dk is the lever
  C. HJB LLGC d=10 drive config (K=2048) — both levers engage

Usage: python3 experiments/proto_auto_defaults.py [--smoke]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from pspde.utils import enable_compilation_cache


def run_cell(tag, make, L):
    out = {}
    for mode in ("forced_r4", "auto"):
        s = make(mode)
        t0 = time.perf_counter()
        s.train()
        wall = time.perf_counter() - t0
        out[mode] = {"wall_s": round(wall, 2),
                     "s_per_iter": round(wall / L, 5),
                     "layout": getattr(s, "resolved_layout", "kd"),
                     "spc": getattr(s, "resolved_steps_per_call", 1),
                     "loss": float(np.asarray(s.loss_log)[-1])}
    out["speedup"] = round(out["forced_r4"]["wall_s"]
                           / out["auto"]["wall_s"], 2)
    print(json.dumps({tag: out}), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    from pspde.problems import ExponentialOnBallNonlinearSin, LLGC
    from pspde.solvers import EllipticSolver, HJBSolver

    L = 50 if args.smoke else 500
    p50 = ExponentialOnBallNonlinearSin(d=50, alpha=0.1)

    def ell(K):
        def make(mode):
            kw = {}
            if mode == "forced_r4":
                kw = dict(layout="kd", steps_per_call=1)
            return EllipticSolver(
                p50, f"auto-{K}-{mode}", loss_method="diffusion", K=K,
                N=20, delta_t=1e-3, lr=1e-3, L=L, verbose=False,
                print_every=10**9, **kw)
        return make

    run_cell("A_elliptic_K200", ell(200), L)
    run_cell("B_elliptic_K8192", ell(8192), L)

    p = LLGC(d=10, T=1.0)

    def hjb(mode):
        kw = {}
        if mode == "forced_r4":
            kw = dict(layout="kd", steps_per_call=1)
        return HJBSolver(
            f"auto-hjb-{mode}", p, lr=1e-2, L=L, K=2048, delta_t=1 / 30,
            time_approx="inner", loss_method="log-variance",
            detach_forward=True, learn_Y_0=True, verbose=False,
            early_stopping_time=None, print_every=10**9, **kw)

    run_cell("C_hjb_llgc_d10", hjb, L)


if __name__ == "__main__":
    main()
