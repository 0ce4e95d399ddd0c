#!/usr/bin/env python3
"""Full-budget binom-vs-erfinv endpoint comparison for the STOPPED
fused training kernel (closes the deferral recorded in RESULTS round-5:
"the STOPPED kernel keeps the erfinv default pending a long-budget
stopped-family endpoint").

Config: the round-5 stopped-kernel convergence cell at 10x the budget —
elliptic d=50 diffusion loss (ExponentialOnBallNonlinearSin, reference
/root/reference/solver.py:723-785 loop), K=8192, N=20, 20,000 iters,
`rollout_mode='fused_train'`, fused_rng in {erfinv, binom}.  Endpoint:
tail-200 mean of the fresh-sample test L2 (exit-time statistics see the
noise law directly, so this is the sharpest cheap discriminator).

Usage: python3 -u experiments/proto_stopped_binom_longrun.py [--smoke]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pspde.utils import enable_compilation_cache


def run(rng, iters):
    import numpy as np
    from pspde.problems import ExponentialOnBallNonlinearSin
    from pspde.solvers import EllipticSolver
    p = ExponentialOnBallNonlinearSin(d=50, alpha=0.1)
    s = EllipticSolver(p, f"stopped-binom-longrun-{rng}",
                       loss_method="diffusion", K=8192, N=20,
                       delta_t=1e-3, lr=1e-3, L=iters,
                       rollout_mode="fused_train", fused_rng=rng,
                       K_test_log=4096, print_every=10**9, verbose=False)
    assert s._resolve_fused(), "fused_train gate failed"
    t0 = time.perf_counter()
    s.train()
    wall = time.perf_counter() - t0
    tail = float(np.mean(s.V_test_L2[-200:]))
    return {"rng": rng, "iters": iters, "test_L2_tail200": tail,
            "loss_final": float(s.loss_log[-1]), "wall_s": round(wall, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()
    iters = 200 if args.smoke else 20000
    out = []
    for rng in ("erfinv", "binom"):
        r = run(rng, iters)
        print(json.dumps(r), flush=True)
        out.append(r)
    print(json.dumps({"summary": out}), flush=True)


if __name__ == "__main__":
    main()
