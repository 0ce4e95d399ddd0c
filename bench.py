#!/usr/bin/env python3
"""Benchmark: SDE path-steps/sec/chip on the d=100 HJB north-star config.

Runs the full training step (rollout + log-variance loss + backprop
through all N Euler steps + Adam update) of the HJB solver on a d=100
Ornstein-Uhlenbeck HJB problem, in both f32 and mixed bf16 (bf16 path
state + net matmuls, f32 accumulators), dispatched as scan-chunked jitted
calls exactly like production training (steps_per_call).

Baseline: the reference implementation's implied throughput on its
Allen-Cahn d=100 diffusion-loss config is ~15,000 path-steps/s on a CUDA
GPU (BASELINE.md: K*N = 200*25 = 5000 steps per ~0.33 s iteration).

Roofline: the algorithm is HBM-bandwidth-bound (tiny nets, large path
state); the JSON line reports XLA's own bytes-accessed estimate per path
step and the achieved fraction of the v5e's 819 GB/s HBM bandwidth.

Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0] if "/" in __file__ else ".")

import jax
import jax.numpy as jnp

REFERENCE_PATH_STEPS_PER_SEC = 15_000.0
V5E_HBM_BYTES_PER_SEC = 819e9


def measure(dtype, K=131072, d=100, steps_per_call=20, n_chunks=3,
            rollout_mode="scan"):
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver
    from pspde.solvers._chunk import make_chunked_step

    problem = LLGC(d=d, T=1.0)
    # remat=True: at this K the backward pass is HBM-bound, so
    # recomputing the forward activations beats storing them (~1.7x)
    solver = HJBSolver(
        "bench-hjb-d100", problem, lr=1e-3, L=1, K=K, delta_t=1.0 / 32,
        time_approx="inner", loss_method="log-variance",
        detach_forward=True, learn_Y_0=True, verbose=False,
        early_stopping_time=None, remat=True, dtype=dtype,
        rollout_mode=rollout_mode,
    )
    N = solver.N
    chunk = make_chunked_step(solver._build_step(0), steps_per_call)

    params, opt_state = solver.params, solver.opt_state
    key = jax.random.PRNGKey(0)

    bytes_per_chunk = None
    try:
        cost = chunk.lower(params, opt_state, key).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        bytes_per_chunk = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    params, opt_state, key, aux = chunk(params, opt_state, key)  # compile
    jax.block_until_ready(aux["loss"])

    t0 = time.perf_counter()
    for _ in range(n_chunks):
        params, opt_state, key, aux = chunk(params, opt_state, key)
    jax.block_until_ready(aux["loss"])
    dt_iter = (time.perf_counter() - t0) / (n_chunks * steps_per_call)

    res = {"path_steps_per_sec": K * N / dt_iter, "iter_seconds": dt_iter}
    if bytes_per_chunk:
        bytes_per_iter = bytes_per_chunk / steps_per_call
        res["hbm_bytes_per_path_step"] = bytes_per_iter / (K * N)
        res["hbm_bw_util"] = (bytes_per_iter / dt_iter
                              / V5E_HBM_BYTES_PER_SEC)
    return res


def main():
    f32 = measure(jnp.float32)
    bf16 = measure(jnp.bfloat16)
    results = {"f32_scan": f32, "bf16_scan": bf16}
    try:
        # fully-fused Pallas forward (weights + path tile VMEM-resident,
        # in-kernel TPU PRNG) + one flattened differentiable control eval
        results["f32_fused"] = measure(jnp.float32, rollout_mode="fused")
    except Exception:
        pass
    best_name, best = max(results.items(),
                          key=lambda kv: kv[1]["path_steps_per_sec"])
    n_chips = jax.device_count()
    value = best["path_steps_per_sec"] / n_chips

    out = {
        "metric": "sde_path_steps_per_sec_per_chip_d100_hjb",
        "value": round(value, 1),
        "unit": "path-steps/s/chip",
        "vs_baseline": round(value / REFERENCE_PATH_STEPS_PER_SEC, 2),
        "best_mode": best_name,
    }
    for name, r in results.items():
        out[f"{name}_path_steps_per_sec"] = round(r["path_steps_per_sec"], 1)
    for name, r in (("f32", f32), ("bf16", bf16)):
        if "hbm_bw_util" in r:
            out[f"{name}_hbm_bytes_per_path_step"] = round(
                r["hbm_bytes_per_path_step"], 1)
            out[f"{name}_hbm_bw_util_pct_of_819GBps"] = round(
                100 * r["hbm_bw_util"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
