#!/usr/bin/env python3
"""Round-5 verify drive (real TPU): the three changed surfaces.

1. Known-good LLGC d=10 recipe under the NEW defaults (layout='auto',
   steps_per_call='auto') — must hit u_L2 ~0.01 in 200 iters as before.
2. Elliptic d=50 diffusion loss with rollout_mode='fused_train' (the new
   fused stopped-rollout kernel) — must actually resolve to fused_train
   on the TPU, train stably, and V_test_L2 must fall.
3. HJB antithetic + fused_train (noise_sign pairing) — must resolve
   fused_train, converge like plain.

Self-terminating, bounded L. One process, run to completion.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    from pspde.eval import importance_sampling
    from pspde.problems import ExponentialOnBallNonlinearSin, LLGC
    from pspde.solvers import EllipticSolver, HJBSolver

    print("backend:", jax.default_backend(), flush=True)

    # 1. drive recipe under auto defaults
    p = LLGC(d=10, T=1.0)
    s = HJBSolver("llgc", p, lr=1e-2, L=200, K=2048, delta_t=1 / 30,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None)
    t0 = time.time()
    s.train()
    _, _, rel_is = importance_sampling(p, s, K=20000, delta_t=1 / 30)
    print(json.dumps({
        "leg": "hjb_auto_defaults", "u_L2_0": float(s.u_L2_loss[0]),
        "u_L2_final": float(s.u_L2_loss[-1]), "IS_rel": float(rel_is),
        "resolved_layout": s.resolved_layout,
        "resolved_spc": s.resolved_steps_per_call,
        "wall_s": round(time.time() - t0, 1)}), flush=True)
    assert s.u_L2_loss[-1] < 0.05, s.u_L2_loss[-1]
    assert s.resolved_layout == "dk"          # K=2048 >= crossover
    assert s.resolved_steps_per_call > 1

    # 2. fused stopped training engine
    pe = ExponentialOnBallNonlinearSin(d=50, alpha=0.1)
    e = EllipticSolver(pe, "ell-fused", loss_method="diffusion", K=8192,
                       N=20, delta_t=1e-3, lr=1e-3, L=300,
                       K_test_log=4096, verbose=False,
                       rollout_mode="fused_train", print_every=10**9)
    t0 = time.time()
    e.train()
    print(json.dumps({
        "leg": "elliptic_fused_train",
        "resolved": e.resolved_rollout_mode,
        "V_test_L2_0": float(e.V_test_L2[0]),
        "V_test_L2_final": float(np.mean(e.V_test_L2[-20:])),
        "loss_final": float(e.loss_log[-1]),
        "wall_s": round(time.time() - t0, 1)}), flush=True)
    assert e.resolved_rollout_mode == "fused_train"
    assert np.isfinite(e.loss_log).all()
    assert np.mean(e.V_test_L2[-20:]) < 0.5 * e.V_test_L2[0]

    # 3. antithetic fused_train (moment: detach-compatible mean loss —
    # relative_entropy + detach has a degenerate gradient, measured this
    # round and now warned on in HJBSolver.__init__)
    a = HJBSolver("anti-ft", p, lr=1e-2, L=300, K=2048, delta_t=1 / 30,
                  time_approx="inner", loss_method="moment",
                  learn_Y_0=True,
                  detach_forward=True, verbose=False,
                  early_stopping_time=None, antithetic=True,
                  rollout_mode="fused_train")
    t0 = time.time()
    a.train()
    print(json.dumps({
        "leg": "hjb_antithetic_fused_train",
        "resolved": a.resolved_rollout_mode,
        "u_L2_final": float(a.u_L2_loss[-1]),
        "wall_s": round(time.time() - t0, 1)}), flush=True)
    assert a.resolved_rollout_mode == "fused_train"
    assert a.u_L2_loss[-1] < 0.5 * a.u_L2_loss[0], a.u_L2_loss[-1]
    print("VERIFY_R5_OK", flush=True)


if __name__ == "__main__":
    main()
