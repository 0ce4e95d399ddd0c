#!/usr/bin/env python3
"""Probe the fused training kernel at d=1000 (VERDICT r3 item 2).

Round 3 found every probed tile (384/256/128) failed Mosaic compilation
at d=1000, so BASELINE config 5 fell back to the scan (8.6M
path-steps/s).  Round-4 diagnosis: the reference-control table was
stored as (N, d, 1) columns — a size-1 lane dim pads to 128 in VMEM, so
at N=200/d=1000 that ONE buffer was 102 MB.  With the (N, d) row table
(kernels.py u_tab2) the kernel should fit; this probe measures
fused_train vs the bf16/dk/rbg scan on the config-5 shape.

Grid: tile in {auto(384), 256, 512} x unroll {1, 2}; K=16384 (and one
K=100k cell at the winning tile).  Prints one JSON line per cell.

Usage: python3 experiments/proto_fused_d1000.py [--smoke]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from pspde.utils import enable_compilation_cache


def measure(d, K, N, mode, tile=None, unroll=None, steps_per_call=5,
            n_chunks=3, dtype=jnp.float32, rng_impl="threefry",
            layout="kd"):
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver
    from pspde.solvers._chunk import make_chunked_step

    p = LLGC(d=d, T=2.0)
    s = HJBSolver(
        "probe-d1000", p, lr=1e-3, L=1, K=K, delta_t=2.0 / N,
        time_approx="inner", loss_method="log-variance",
        detach_forward=True, learn_Y_0=True, verbose=False,
        early_stopping_time=None, remat=True, dtype=dtype,
        rollout_mode=mode, rng_impl=rng_impl, layout=layout,
        fused_tile=tile, fused_unroll=unroll)
    chunk = make_chunked_step(s._build_step(0), steps_per_call)
    params, opt_state, key = s.params, s.opt_state, s._train_key
    t0 = time.perf_counter()
    params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)
    return {"path_steps_per_sec": round(K * N / dt_iter, 1),
            "iter_s": round(dt_iter, 4),
            "resolved_mode": s.resolved_rollout_mode,
            "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    enable_compilation_cache()

    d, N = (100, 20) if args.smoke else (1000, 200)
    K = 4096 if args.smoke else 16384
    cells = [
        ("scan_bf16_dk_rbg", dict(mode="scan", dtype=jnp.bfloat16,
                                  rng_impl="rbg", layout="dk")),
        ("fused_auto_u2", dict(mode="fused_train")),
        ("fused_auto_u1", dict(mode="fused_train", unroll=1)),
        ("fused_t256_u2", dict(mode="fused_train", tile=256)),
        ("fused_t512_u1", dict(mode="fused_train", tile=512, unroll=1)),
    ]
    out = {}
    for name, kw in cells:
        try:
            r = measure(d, K, N, **kw)
        except Exception as e:
            r = {"error": repr(e)[:300]}
        out[name] = r
        print(json.dumps({name: r}), flush=True)

    fused = {k: v["path_steps_per_sec"] for k, v in out.items()
             if k.startswith("fused") and "path_steps_per_sec" in v
             and v.get("resolved_mode") == "fused_train"}
    if fused and not args.smoke:
        best = max(fused, key=fused.get)
        kw = dict(cells)[best]
        try:
            r = measure(d, 100_000, N, steps_per_call=2, **kw)
        except Exception as e:
            r = {"error": repr(e)[:300]}
        print(json.dumps({f"{best}_K100k": r}), flush=True)


if __name__ == "__main__":
    main()
