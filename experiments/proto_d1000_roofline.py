#!/usr/bin/env python3
"""Roofline the BASELINE config-5 shape (VERDICT r4 item 3): what binds
the d=1000 fused training kernel?

Round 4 recorded 49.6M path-steps/s at d=1000 (tile=384/u2, binom) with
no speed-of-light next to it — the implied noise consumption (~99G
normals/s) sat ABOVE the d=100-implied machine rate (72G/s), so either
the metric was wrong or headroom remained.  This script answers it the
way round 4 answered d=100: the measured ablation ladder
(utils/roofline.py: fused_ablation_rates — noise / +euler / +net /
+accum, all back-to-back in ONE process at the EXACT config-5 kernel
shape), the forward envelope, and the real train step, then
train_pct_of_(envelope/2).

Usage: python3 experiments/proto_d1000_roofline.py [--smoke]
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from pspde.utils import enable_compilation_cache


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--tile", type=int, default=384)
    ap.add_argument("--unroll", type=int, default=2)
    args = ap.parse_args()
    enable_compilation_cache()

    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver
    from pspde.solvers._chunk import make_chunked_step
    from pspde.utils.roofline import fused_ablation_rates

    d, T, dt = (100, 1.0, 1.0 / 32) if args.smoke else (1000, 2.0, 0.01)
    K = 8192 if args.smoke else 98304          # config 5: 10^5 paths
    N = int(round(T / dt))
    p = LLGC(d=d, T=T)

    def build(rng_name):
        return HJBSolver(
            "d1000-roofline", p, lr=1e-3, L=1, K=K, delta_t=dt,
            time_approx="inner", loss_method="log-variance",
            detach_forward=True, learn_Y_0=True, verbose=False,
            early_stopping_time=None, remat=True, u_l2_error_flag=False,
            rollout_mode="fused_train", fused_tile=args.tile,
            fused_unroll=args.unroll, fused_rng=rng_name)

    # 1. real train step, erfinv and binom, same process
    out = {"d": d, "K": K, "N": N, "tile": args.tile,
           "unroll": args.unroll}
    for rng_name in ("erfinv", "binom"):
        s = build(rng_name)
        chunk = make_chunked_step(s._build_step(0), 5)
        # params/opt are DONATED by make_chunked_step — rebind each call
        st = chunk(s.params, s.opt_state, s._train_key)[:3]
        jax.block_until_ready(st[0])
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            st = chunk(*st)[:3]
            jax.block_until_ready(st[0])
            best = max(best, K * N / ((time.perf_counter() - t0) / 5))
        assert s.resolved_rollout_mode == "fused_train"
        out[f"train_{rng_name}_path_steps_per_sec"] = round(best, 1)
        print(json.dumps({f"train_{rng_name}": round(best, 1)}),
              flush=True)

    # 2. ablation ladder at the exact kernel shape, same process
    s = build("erfinv")
    lad = fused_ablation_rates(p, s, K=K, tile=args.tile,
                               unroll=args.unroll, reps=5)
    out["ladder"] = {k: (round(v, 1) if isinstance(v, float) else v)
                     for k, v in lad.items()}
    print(json.dumps({"ladder": out["ladder"]}), flush=True)

    # 3. derived roofline: the backward replays the forward, so the
    # structural ceiling for the train step is full_forward/2; the
    # binding-resource ceiling is noise/2
    full = lad.get("full") or 0.0
    noise = lad.get("noise") or 0.0
    binom_full = lad.get("full_binom") or 0.0
    for tag, env in (("erfinv", full), ("binom", binom_full)):
        tr = out.get(f"train_{tag}_path_steps_per_sec", 0.0)
        if env > 0 and tr:
            out[f"train_{tag}_pct_of_fwd_envelope"] = round(
                100 * tr / (env / 2), 1)
    if noise > 0:
        out["noise_halved_ceiling_path_steps_per_sec"] = round(
            noise / 2, 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
