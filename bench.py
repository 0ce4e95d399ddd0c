#!/usr/bin/env python3
"""Benchmark: SDE path-steps/sec/chip on the d=100 HJB north-star config.

Runs the full training step (rollout + log-variance loss + backprop +
Adam update, with the u-L2 reference-error diagnostic ON) of the HJB
solver on a d=100 Ornstein-Uhlenbeck HJB problem, dispatched as
scan-chunked jitted calls exactly like production training.

Baseline: the reference implementation's implied throughput on its
Allen-Cahn d=100 diffusion-loss config is ~15,000 path-steps/s on a CUDA
GPU (BASELINE.md: K*N = 200*25 = 5000 steps per ~0.33 s iteration).

Bottleneck profile (measured round 3 on v5e, correcting the round-2
"HBM-bandwidth-bound" claim): the step is NOT HBM-bound (~0.1% of the
819 GB/s) and NOT MXU-throughput-bound (MFU of a few %%); it is bound by
per-step VPU work — PRNG bit generation + uniform->normal transform +
O(K d) elementwise state updates — plus MXU pipeline fill on the 30-wide
control-net matmuls.  The three round-3 fixes stack: a transposed
K-in-lanes layout (removes matmul lane padding; exposes the PRNG),
rng_impl='rbg' / in-kernel hardware PRNG with erf_inv normals (removes
threefry), and the fused custom-VJP Pallas training kernel (removes the
per-step HBM carry round-trip; forward AND backward are one kernel each
with the path tile resident in VMEM).  Either layout or RNG fix alone
moves the needle <5%; together they are ~1.6x, and the fused kernel adds
the rest.

JSON reports, per mode, path-steps/s plus: model FLOP utilization
(mfu_pct, vs the v5e bf16 peak), the measured forward-only envelope of
the best mode and the train/forward ratio, XLA's HBM-bytes estimate, and
any mode that FAILED (surfaced, not swallowed).  Modes that lose are
still printed — the best mode sets `value`.

Prints ONE JSON line.
"""

import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 1)[0] if "/" in __file__ else ".")

import jax
import jax.numpy as jnp

from pspde.utils import enable_compilation_cache

enable_compilation_cache()  # reuse fused-kernel/step compiles across runs

REFERENCE_PATH_STEPS_PER_SEC = 15_000.0
V5E_HBM_BYTES_PER_SEC = 819e9
V5E_BF16_PEAK_FLOPS = 197e12
D = 100
N_STEPS = 32
# control-net matmul FLOPs per path-step: TanhMLP (d+1)->30->30->d,
# forward 2 * sum(in*out); the train step adds ~2x for the backward
# (input- and weight-gradient matmuls)
FWD_FLOPS_PER_PATH_STEP = 2 * ((D + 1) * 30 + 30 * 30 + 30 * D)
TRAIN_FLOPS_PER_PATH_STEP = 3 * FWD_FLOPS_PER_PATH_STEP


def measure(dtype, K=131072, d=D, steps_per_call=20, n_chunks=3,
            rollout_mode="scan", rng_impl="threefry", layout="kd",
            **solver_kw):
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver
    from pspde.solvers._chunk import make_chunked_step

    problem = LLGC(d=d, T=1.0)
    # remat=True: recomputing forward activations beats storing them
    # (the stored-carry variant is HBM-bound and ~1.8x slower)
    solver = HJBSolver(
        "bench-hjb-d100", problem, lr=1e-3, L=1, K=K, delta_t=1.0 / N_STEPS,
        time_approx="inner", loss_method="log-variance",
        detach_forward=True, learn_Y_0=True, verbose=False,
        early_stopping_time=None, remat=True, dtype=dtype,
        rollout_mode=rollout_mode, rng_impl=rng_impl, layout=layout,
        **solver_kw,
    )
    N = solver.N
    chunk = make_chunked_step(solver._build_step(0), steps_per_call)

    params, opt_state = solver.params, solver.opt_state
    key = solver._train_key

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

    psps = K * N / dt_iter
    res = {"path_steps_per_sec": psps, "iter_seconds": dt_iter,
           "mfu_pct": 100 * psps * TRAIN_FLOPS_PER_PATH_STEP
           / V5E_BF16_PEAK_FLOPS}
    if bytes_per_chunk:
        bytes_per_iter = bytes_per_chunk / steps_per_call
        res["hbm_bytes_per_path_step"] = bytes_per_iter / (K * N)
        res["hbm_bw_util_pct"] = (100 * bytes_per_iter / dt_iter
                                  / V5E_HBM_BYTES_PER_SEC)
    return res


def measure_fwd_envelope(K=131072, n_reps=10, rng="erfinv", best_of=3):
    """Forward-only throughput of the fused training kernel (the replay
    envelope the custom-VJP backward is bounded by).  ``K`` and ``rng``
    MUST match the winning mode's exact config (VERDICT r4 item 2: the
    shipped r4 artifact recorded train at 113.7%% of a K-mismatched
    envelope measured in a different process state).  Best-of-``best_of``
    rep groups: an envelope is an upper bound, so tunnel jitter must not
    deflate it."""
    import numpy as np
    from pspde.ansatz.transposed import make_transposed_apply
    from pspde.problems import LLGC
    from pspde.rollout.kernels import make_fused_train_rollout
    from pspde.solvers import HJBSolver

    p = LLGC(d=D, T=1.0)
    s = HJBSolver("bench-fwd", p, lr=1e-3, L=1, K=K, delta_t=1.0 / N_STEPS,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None)
    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    run = make_fused_train_rollout(
        p, z_apply_T, leaves_ex, K, s.N, s.delta_t, adaptive_forward=True,
        rng=rng,
        u_tab=p.u_ref_table(np.arange(s.N) * s.delta_t))
    fwd = jax.jit(lambda lv, sd: run(lv, sd).Y.sum())
    leaves = tuple(jax.tree.leaves(s.params["z"]))
    out = fwd(leaves, jnp.float32(3))
    jax.block_until_ready(out)
    best = 0.0
    for g in range(best_of):
        t0 = time.perf_counter()
        for i in range(n_reps):
            out = fwd(leaves, jnp.float32(g * n_reps + i))
        jax.block_until_ready(out)
        best = max(best, K * s.N / ((time.perf_counter() - t0) / n_reps))
    return best


def measure_vpu_roofline():
    """Measured VPU-roofline ceiling of the fused train step (VERDICT r3
    item 1): microbenchmarked FMA/normals machine rates + jaxpr-counted
    per-path-step work (pspde/utils/roofline.py).  The MXU MFU reported
    alongside is the WRONG roofline for this VPU-bound step — this is
    the right one."""
    from pspde.problems import LLGC
    from pspde.solvers import HJBSolver
    from pspde.utils.roofline import fused_train_vpu_roofline

    p = LLGC(d=D, T=1.0)
    s = HJBSolver("bench-roofline", p, lr=1e-3, L=1, K=256,
                  delta_t=1.0 / N_STEPS, time_approx="inner",
                  loss_method="log-variance", detach_forward=True,
                  learn_Y_0=True, verbose=False,
                  early_stopping_time=None)
    return fused_train_vpu_roofline(p, s)


def main():
    results, errors = {}, {}

    def attempt(name, fn):
        try:
            results[name] = fn()
        except Exception as e:  # surfaced in the JSON (ADVICE r2)
            errors[name] = repr(e)[:300]

    attempt("f32_scan", lambda: measure(jnp.float32))
    attempt("bf16_scan_dk_rbg", lambda: measure(
        jnp.bfloat16, rng_impl="rbg", layout="dk"))
    attempt("f32_scan_dk_rbg", lambda: measure(
        jnp.float32, rng_impl="rbg", layout="dk"))
    # rng pinned explicitly in both fused modes: the kernel default
    # became 'binom' in round 5, and the bench names must stay truthful
    attempt("f32_fused_train", lambda: measure(
        jnp.float32, rollout_mode="fused_train", fused_rng="erfinv"))
    attempt("f32_fused_binom", lambda: measure(
        jnp.float32, rollout_mode="fused_train", fused_rng="binom"))
    attempt("f32_fused_legacy", lambda: measure(
        jnp.float32, rollout_mode="fused"))

    if not results:
        print(json.dumps({"metric": "sde_path_steps_per_sec_per_chip_"
                          "d100_hjb", "value": 0.0, "unit":
                          "path-steps/s/chip", "vs_baseline": 0.0,
                          "errors": errors}))
        return

    best_name = max(results, key=lambda k:
                    results[k]["path_steps_per_sec"])

    # config sweep on the winning mode (steps_per_call / K)
    sweep_kw = {
        "f32_scan": {},
        "bf16_scan_dk_rbg": dict(rng_impl="rbg", layout="dk"),
        "f32_scan_dk_rbg": dict(rng_impl="rbg", layout="dk"),
        "f32_fused_train": dict(rollout_mode="fused_train",
                                fused_rng="erfinv"),
        "f32_fused_binom": dict(rollout_mode="fused_train",
                                fused_rng="binom"),
        "f32_fused_legacy": dict(rollout_mode="fused"),
    }[best_name]
    sweep_dtype = jnp.bfloat16 if best_name.startswith("bf16") else \
        jnp.float32
    for tag, kw in [("spc50", dict(steps_per_call=50)),
                    ("spc100", dict(steps_per_call=100)),
                    ("spc200", dict(steps_per_call=200)),
                    ("K262144", dict(K=262144, steps_per_call=100))]:
        attempt(f"{best_name}_{tag}", lambda kw=kw: measure(
            sweep_dtype, **sweep_kw, **kw))
    best_name = max(results, key=lambda k:
                    results[k]["path_steps_per_sec"])
    best = results[best_name]

    # envelope at the WINNER's exact (K, rng), immediately after the
    # winner, same process, best-of-n (VERDICT r4 item 2)
    fwd_envelope = None
    best_K = 262144 if best_name.endswith("K262144") else 131072
    try:
        fwd_envelope = measure_fwd_envelope(
            K=best_K, rng="binom" if "binom" in best_name else "erfinv")
    except Exception as e:
        errors["fwd_envelope"] = repr(e)[:300]

    roofline = None
    try:
        roofline = measure_vpu_roofline()
    except Exception as e:
        errors["vpu_roofline"] = repr(e)[:300]

    n_chips = jax.device_count()
    value = best["path_steps_per_sec"] / n_chips

    out = {
        "metric": "sde_path_steps_per_sec_per_chip_d100_hjb",
        "value": round(value, 1),
        "unit": "path-steps/s/chip",
        "vs_baseline": round(value / REFERENCE_PATH_STEPS_PER_SEC, 2),
        "best_mode": best_name,
        "mfu_pct_of_v5e_bf16_peak": round(best["mfu_pct"], 2),
    }
    # the MXU MFU above is reported for BASELINE.json's ">=50% of TPU
    # FLOP roofline" target but is the WRONG utilization metric for this
    # VPU-bound step — vpu_roofline_pct below is the valid one
    out["mfu_note"] = "step is VPU/PRNG-bound; see vpu_roofline_pct"
    if fwd_envelope:
        out["fwd_envelope_path_steps_per_sec"] = round(fwd_envelope, 1)
        pct = 100 * best["path_steps_per_sec"] / (fwd_envelope / 2)
        out["train_pct_of_fwd_envelope"] = round(pct, 1)
        # /2: a recompute-based backward replays the forward once, so the
        # structural bound for fwd+bwd is half the forward-only rate
        if pct > 105.0:
            # never ship a self-contradictory artifact silently again
            # (VERDICT r4 weak 1): >105% of a hard bound means the
            # envelope measurement failed, not that the bound is beaten
            out["roofline_inconsistent"] = True
    # generator-mismatch guard (code review r5): the microbench normals
    # rate is measured with the erfinv generator; a binom winner runs
    # ~1.5x that ceiling BY DESIGN (cheaper noise), so comparing it to
    # the erfinv speed of light would ship a spurious
    # roofline_inconsistent=True whenever the in-process envelope
    # measurement failed.  Without a same-generator envelope, skip the
    # pct rather than flag a healthy run.
    winner_binom = "binom" in best_name
    if (roofline and not fwd_envelope and winner_binom):
        out["vpu_roofline_note"] = (
            "skipped: fwd_envelope failed and the erfinv normals "
            "microbench is not a bound for the binom generator")
    elif roofline and (fwd_envelope or
                       roofline.get("prng_normals_per_sec", 0) > 0):
        # The binding VPU resource is PRNG-normals generation (round-4
        # study, RESULTS.md): the measured forward runs at ~100% of the
        # normals-only machine rate, so the train step's roofline is
        # normals_rate / (2d) — every path-step's d-vector of noise is
        # drawn twice (forward + the custom-VJP backward's replay).
        # Guard: the measured forward envelope itself PROVES the machine
        # rate is >= fwd_psps * d (it draws that while also doing the
        # Euler/net/accumulator work), so take the max — the isolated
        # microbench underreads in some tunnel process states.
        rn = roofline["prng_normals_per_sec"]
        if fwd_envelope:
            rn = max(rn, fwd_envelope * D)
        prng_sol = rn / (2.0 * D)
        out["vpu_roofline_path_steps_per_sec"] = round(prng_sol, 1)
        out["vpu_roofline_pct"] = round(
            100 * best["path_steps_per_sec"] / prng_sol, 1)
        if out["vpu_roofline_pct"] > 105.0:
            out["roofline_inconsistent"] = True
        out["prng_normals_per_sec"] = round(rn, 1)
        out["vpu_fma_flops_per_sec"] = round(
            roofline["vpu_fma_flops_per_sec"], 1)
        # conservative sum-model ceiling (jaxpr-counted elem work at the
        # measured FMA rate + normals): documented to UNDERESTIMATE the
        # machine (no generation/ALU overlap) — kept for the work
        # decomposition, not as the headline roofline
        out["vpu_sum_model_ceiling_path_steps_per_sec"] = round(
            roofline["roofline_path_steps_per_sec"], 1)
    for name, r in results.items():
        out[f"{name}_path_steps_per_sec"] = round(
            r["path_steps_per_sec"], 1)
    for name in ("f32_scan", best_name):
        r = results.get(name)
        if r and "hbm_bw_util_pct" in r:
            out[f"{name}_hbm_bw_util_pct"] = round(r["hbm_bw_util_pct"], 2)
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
