#!/usr/bin/env python3
"""Prototype 4: squeeze the fused_train kernel past 221.9M path-steps/s.

Round-3 BENCH_r03 landed at 221.9M with (tile=4096, steps_per_call=100)
on the d=100 HJB north-star config.  Two cheap knobs remain unexplored:

  * steps_per_call=200 (the 20/50/100 sweep was still rising: 215.2 /
    220.6 / 221.9 — dispatch amortization may have a point left)
  * VMEM tile size: 4096 was adopted because 8192 OOMs the ~16 MiB
    scoped-VMEM stack; the intermediate multiples-of-1024 between them
    (5120, 6144) were never measured.  Larger tiles mean fewer grid
    programs (less per-tile weight reload / pipeline fill); K=131072
    divides 4096 exactly, pads 3% at 6144 (22 tiles of 6144 = 135168)
    and 2.4% at 5120 (26 tiles).

Each variant is a full solver train step (rollout + log-variance loss +
Adam) measured exactly like bench.py.  Tile is injected by wrapping
pspde.rollout.kernels.make_fused_train_rollout (the solver resolves the
symbol at step-build time, so the wrap is picked up without a solver
kwarg).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import pspde.rollout.kernels as kmod

K_PATHS = 131072
N = 32


def measure(steps_per_call, tile, n_chunks=3, unroll=1, K=K_PATHS):
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver
    from pspde.solvers._chunk import make_chunked_step

    orig = kmod.make_fused_train_rollout

    def patched(*a, **kw):
        kw.setdefault("tile", tile)
        kw.setdefault("unroll", unroll)
        return orig(*a, **kw)

    kmod.make_fused_train_rollout = patched
    try:
        problem = LLGC(d=100, T=1.0)
        solver = HJBSolver(
            "proto-fused", problem, lr=1e-3, L=1, K=K,
            delta_t=1.0 / N, time_approx="inner",
            loss_method="log-variance", detach_forward=True,
            learn_Y_0=True, verbose=False, early_stopping_time=None,
            remat=True, rollout_mode="fused_train")
        chunk = make_chunked_step(solver._build_step(0), steps_per_call)
        params, opt_state, key = (solver.params, solver.opt_state,
                                  solver._train_key)
        t_c0 = time.perf_counter()
        params, opt_state, key, aux = chunk(params, opt_state, key)
        jax.block_until_ready(aux["loss"])
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(n_chunks):
            params, opt_state, key, aux = chunk(params, opt_state, key)
        jax.block_until_ready(aux["loss"])
        dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)
        return {"path_steps_per_sec": K * N / dt_iter,
                "iter_ms": dt_iter * 1e3, "compile_s": compile_s}
    finally:
        kmod.make_fused_train_rollout = orig


def main():
    variants = [
        # time-loop unrolling: lets Mosaic overlap step n+1's PRNG/VPU
        # work with step n's narrow matmuls (pipeline-fill hypothesis);
        # measured earlier this round: spc100/200_tile4096 222.0/222.7M,
        # tile5120 214.0M, tile6144 compile-OOM, K262144 222.8M;
        # unroll round 1: tile4096_u2 229.4M, tile2048_u4 224.8M,
        # tile4096_u4 + tile4096_u8 compile-OOM
        ("spc200_tile4096_u2", dict(steps_per_call=200, tile=4096,
                                    unroll=2)),
        ("spc100_tile2048_u2", dict(steps_per_call=100, tile=2048,
                                    unroll=2)),
        ("spc100_tile2048_u8", dict(steps_per_call=100, tile=2048,
                                    unroll=8)),
        ("spc100_tile1024_u8", dict(steps_per_call=100, tile=1024,
                                    unroll=8)),
        ("spc100_tile4096_u2_K262144", dict(steps_per_call=100, tile=4096,
                                            unroll=2, K=262144)),
    ]
    if "--smoke" in sys.argv:
        variants = [("spc2_tile256", dict(steps_per_call=2, tile=256,
                                          unroll=2, K=1024))]
    out = {}
    for name, kw in variants:
        try:
            r = measure(**kw)
            out[name] = {k: round(v, 1) for k, v in r.items()}
        except Exception as e:
            out[name] = {"error": repr(e)[:200]}
        print(json.dumps({name: out[name]}), flush=True)
    best = max((v["path_steps_per_sec"], k) for k, v in out.items()
               if "path_steps_per_sec" in v)
    print(json.dumps({"best": best[1], "path_steps_per_sec": best[0]}))


if __name__ == "__main__":
    main()
