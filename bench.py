#!/usr/bin/env python3
"""Benchmark: SDE path-steps/sec/chip on the d=100 HJB north-star config.

Runs the full jitted training step (rollout + log-variance loss + backprop
through all N Euler steps + Adam update) of the HJB solver on a d=100
Ornstein-Uhlenbeck HJB problem and reports throughput in SDE path-steps
per second per chip.

Baseline: the reference implementation's implied throughput on its
Allen-Cahn d=100 diffusion-loss config is ~15,000 path-steps/s on a CUDA
GPU (BASELINE.md: K*N = 200*25 = 5000 steps per ~0.33 s iteration).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0] if "/" in __file__ else ".")

import jax

REFERENCE_PATH_STEPS_PER_SEC = 15_000.0


def main():
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver

    d = 100
    K = 65536
    delta_t = 1.0 / 32
    T = 1.0
    problem = LLGC(d=d, T=T)
    # remat=True: at this K the backward pass is HBM-bound, so
    # recomputing the forward activations beats storing them (~1.7x)
    solver = HJBSolver(
        "bench-hjb-d100", problem, lr=1e-3, L=1, K=K, delta_t=delta_t,
        time_approx="inner", loss_method="log-variance",
        detach_forward=True, learn_Y_0=True, verbose=False,
        early_stopping_time=None, remat=True,
    )
    N = solver.N

    step = solver._get_step(0)
    key = jax.random.PRNGKey(0)
    params, opt_state = solver.params, solver.opt_state

    # warmup / compile
    params, opt_state, m = step(params, opt_state, key)
    jax.block_until_ready(m["loss"])

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, m = step(params, opt_state,
                                    jax.random.fold_in(key, i))
    jax.block_until_ready(m["loss"])
    dt_iter = (time.perf_counter() - t0) / iters

    path_steps_per_sec = K * N / dt_iter
    n_chips = jax.device_count()
    value = path_steps_per_sec / n_chips

    print(json.dumps({
        "metric": "sde_path_steps_per_sec_per_chip_d100_hjb",
        "value": round(value, 1),
        "unit": "path-steps/s/chip",
        "vs_baseline": round(value / REFERENCE_PATH_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
