#!/usr/bin/env python3
"""Full-budget validation of the moment-matched binomial fused-kernel
noise (VERDICT r4 item 3): binom vs erfinv at EQUAL reference-scale
budget on the bench north-star config (LLGC d=100, K=131072, N=32,
log-variance, fused_train), comparing final u_L2 and the IS relative
error of the learned control.

Round 4 shipped binom as the 362M path-steps/s headline on the strength
of moment/kurtosis tests plus 1000-iter drive checks only; this script
records the long-budget endpoints that decide whether binom's weak-order
moment matching holds to convergence.

Usage: python3 experiments/proto_binom_longrun.py [--smoke] [--L 20000]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from common import parse_args

import jax


def leg(rng_name, args):
    from pspde.eval import importance_sampling
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver

    p = LLGC(d=args.d, T=1.0)
    s = HJBSolver(
        "binom-long-%s" % rng_name, p, lr=1e-3, L=args.L, K=args.K,
        delta_t=1.0 / 32, time_approx="inner", loss_method="log-variance",
        detach_forward=True, learn_Y_0=True, verbose=False,
        early_stopping_time=None, remat=True,
        rollout_mode="fused_train", fused_rng=rng_name)
    t0 = time.time()
    s.train()
    wall = time.time() - t0
    assert s.resolved_rollout_mode == "fused_train", s.resolved_rollout_mode
    import numpy as np
    tail = float(np.mean(s.u_L2_loss[-200:]))
    _, _, rel_is = importance_sampling(
        p, s, K=20000, delta_t=1.0 / 32, key=jax.random.PRNGKey(123))
    return {"rng": rng_name, "u_L2_final": float(s.u_L2_loss[-1]),
            "u_L2_tail200": tail, "loss_final": float(s.loss_log[-1]),
            "IS_rel": float(rel_is), "wall_s": round(wall, 1),
            "iters": len(s.loss_log)}


def main():
    args = parse_args(default_L=20000,
                      extra={"--d": dict(type=int, default=100),
                             "--K": dict(type=int, default=131072)})
    if args.smoke:
        args.K = min(args.K, 4096)
    for rng_name in ("erfinv", "binom"):
        r = leg(rng_name, args)
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
