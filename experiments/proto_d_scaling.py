#!/usr/bin/env python3
"""Throughput vs dimension: is the r3 layout/RNG work d=100-specific?

Sweeps the d=100 bench harness (bench.py: measure) over state dimensions
for the scan modes (the fused kernel is swept only where its Mosaic
compile is already cached — new shapes cost 3-25 min each on the axon
tunnel).  LLGC at every d, K=131072, N=32, identical to bench.py's
north-star config otherwise.  Prints one JSON line per (mode, d).
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dims", type=str, default="10,30,100,300,1000")
    ap.add_argument("--fused-dims", type=str, default="100",
                    help="dims to also run rollout_mode=fused_train at")
    ap.add_argument("--binom", action="store_true",
                    help="add the fused_rng='binom' column at "
                         "--fused-dims (round 4: the moment-matched "
                         "popcount generator; RESULTS.md d-scaling)")
    ap.add_argument("--K", type=int, default=131072)
    args = ap.parse_args()
    dims = [int(x) for x in args.dims.split(",") if x]
    fused_dims = {int(x) for x in args.fused_dims.split(",") if x}

    modes = [
        ("f32_scan", dict(dtype=jnp.float32)),
        ("f32_scan_dk_rbg", dict(dtype=jnp.float32, rng_impl="rbg",
                                 layout="dk")),
        ("bf16_scan_dk_rbg", dict(dtype=jnp.bfloat16, rng_impl="rbg",
                                  layout="dk")),
    ]
    for d in dims:
        todo = list(modes)
        if d in fused_dims:
            todo.append(("f32_fused_train",
                         dict(dtype=jnp.float32,
                              rollout_mode="fused_train",
                              steps_per_call=100)))
            if args.binom:
                todo.append(("f32_fused_binom",
                             dict(dtype=jnp.float32,
                                  rollout_mode="fused_train",
                                  fused_rng="binom",
                                  steps_per_call=100)))
        for name, kw in todo:
            kw = dict(kw)
            dtype = kw.pop("dtype")
            try:
                r = bench.measure(dtype, K=args.K, d=d, **kw)
                print(json.dumps({
                    "mode": name, "d": d, "K": args.K,
                    "path_steps_per_sec": round(
                        r["path_steps_per_sec"], 1),
                    "iter_ms": round(1e3 * r["iter_seconds"], 2),
                }), flush=True)
            except Exception as e:
                print(json.dumps({"mode": name, "d": d,
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
