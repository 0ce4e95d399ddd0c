"""Measured VPU roofline for the SDE training step (VERDICT r3 item 1).

The d=100 HJB train step is VPU-bound — PRNG bit generation, the
uniform->normal transform, and O(d K) elementwise state/accumulator
updates dominate; the MXU matmuls of the 30-wide control net and the
HBM traffic are both a few percent of their peaks (RESULTS.md round-3
bottleneck study).  bench.py therefore needs a VPU roofline, not the
MXU-MFU it reported in round 3 (the wrong roofline for this workload).

What the round-4 measurement campaign established (all on-chip):

  * The BINDING resource is PRNG-normals generation.  The measured
    normals machine rate (marginal-rate microbench below) is ~45 G/s;
    the fused FORWARD kernel draws d normals per path-step and runs at
    ~100%% of that rate (459M path-steps/s at d=100) — Euler, net
    matmuls and accumulators all hide behind generation.  The TRAIN
    step's roofline is therefore normals_rate / (2 d): the custom-VJP
    backward replays the forward's PRNG stream, so each path-step's
    noise is generated twice.  bench.py reports the measured train
    throughput against this as ``vpu_roofline_pct``.

  * Isolated microbenches through the axon tunnel are UNRELIABLE in
    absolute terms: identical kernels measured 17 G/s in one process
    and 45 G/s in another, Mosaic schedules a noise-only loop WORSE
    than the full forward (fused_ablation_rates: 281M vs 459M
    path-steps/s), and affine FMA chains get algebraically folded.
    Mitigations used here: the marginal-rate (two-point) estimator
    cancels fixed per-call costs, chains use a non-foldable quadratic
    map, and bench.py lower-bounds the normals rate by what the real
    forward kernel provably sustains (fwd_psps * d).

  * The sum-model ceiling (jaxpr-counted elementwise work charged at
    the measured FMA rate PLUS normals at the normals rate,
    `fused_train_vpu_roofline`) assumes no generation/ALU overlap and
    measurably UNDERESTIMATES the machine — it is kept for the work
    decomposition, not as the headline roofline.

  * Having PROVEN the kernel sits at the noise speed of light, the
    round-4 follow-up LOWERED the roofline itself: the in-situ
    attribution stages (full_rawbits / full_binom) showed the erf_inv
    transform — not bit generation — is ~48% of the forward, and the
    moment-matched binomial generator (kernels.py:
    _normals_from_bits_binom, ``fused_rng='binom'``) removed it:
    d=100 train 232.5 -> 362.5M path-steps/s, again ~95% of the (new,
    cheaper) replay bound.

No reference counterpart (the reference has no profiling at all,
SURVEY §5.1).
"""

from __future__ import annotations

import time
import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

__all__ = ["vpu_fma_rate", "prng_normals_rate", "count_vpu_work",
           "fused_ablation_rates", "fused_train_vpu_roofline"]


def _marginal_rate(build_f, arg, P, work_per_pass, reps=5, outer=3):
    """Two-point marginal rate: time the kernel at P and at 2P passes
    and divide the extra work by the extra time.  A fixed per-call cost
    cancels exactly — load-bearing here because dispatch through the
    axon tunnel shows process-dependent ~10 ms/call overheads (round 4:
    the same normals kernel read 17 G/s in one process and 1.85 T/s in
    another; the per-call times differed by a constant).  Best of
    ``outer`` passes guards the residual jitter."""
    f1, f2 = build_f(P), build_f(2 * P)
    jax.block_until_ready(f1(arg))
    jax.block_until_ready(f2(arg))
    best = 0.0
    for _ in range(outer):
        t0 = time.perf_counter()
        for _ in range(reps):
            o1 = f1(arg)
        jax.block_until_ready(o1)
        t1 = (time.perf_counter() - t0) / reps
        t0 = time.perf_counter()
        for _ in range(reps):
            o2 = f2(arg)
        jax.block_until_ready(o2)
        t2 = (time.perf_counter() - t0) / reps
        if t2 > t1:
            best = max(best, P * work_per_pass / (t2 - t1))
    return best


def vpu_fma_rate(d=100, tile=4096, P=512, chain=16, reps=5):
    """Sustained f32 FMA element-flops/s.

    Per fori_loop pass the body applies a ``chain``-deep quadratic-map
    sequence ``x <- x*x + c_j`` (c ~ -1.75: the bounded chaotic regime)
    to the (d, tile) carry.  The map is exactly one FMA per element per
    step and — unlike an affine chain a_j*x + b_j, which Mosaic folds
    into a single FMA and which round 4 measured at an unphysical
    128 T elem/s — cannot be algebraically collapsed.  The carry's VMEM
    round-trip is amortized over ``chain`` ALU ops per element, the
    same regime as the fused kernel's register-resident op chains."""
    from jax.experimental import pallas as pl

    def build(p):
        def kernel(x_ref, o_ref):
            def body(i, x):
                c = -1.75 + 1e-7 * i.astype(jnp.float32)
                for j in range(chain):
                    x = x * x + (c + 1e-6 * j)
                return x
            o_ref[:] = jax.lax.fori_loop(0, p, body, x_ref[:])
        return jax.jit(lambda x: pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((d, tile), jnp.float32))(x))

    x = jnp.full((d, tile), 0.3, jnp.float32)
    return _marginal_rate(build, x, P, 2.0 * d * tile * chain, reps=reps)


def prng_normals_rate(d=100, tile=4096, P=512, reps=5):
    """Sustained erfinv-normals/s (hardware PRNG + quantile map)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..rollout.kernels import _normals_from_bits_erfinv

    def build(p):
        def kernel(seed_ref, o_ref):
            pltpu.prng_seed(seed_ref[0])

            def body(i, acc):
                # reduce to a (1, tile) carry so the loop cost is the
                # generation itself, not a (d, tile) carry round-trip
                xi = _normals_from_bits_erfinv((d, tile))
                return acc + jnp.sum(xi, axis=0, keepdims=True)
            o_ref[:] = jax.lax.fori_loop(0, p, body,
                                         jnp.zeros((1, tile), jnp.float32))
        return jax.jit(lambda s: pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(1,), in_specs=[],
                out_specs=pl.BlockSpec((1, tile), lambda i, *_: (0, 0),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((1, tile), jnp.float32))(s))

    s = jnp.asarray([7], jnp.int32)
    return _marginal_rate(build, s, P, d * tile, reps=reps)


# Elementwise primitives and their FMA-equivalent per-element weight.
# Transcendental weights are the measured VPU latency class on v5e
# (erf_inv ~ a short polynomial, exp/log/tanh ~ longer chains); cheap
# ALU ops are 1.  Weights are deliberately coarse — the roofline's
# dominant terms are the PRNG draws and the 1-weight bulk ops.
_ELEM_WEIGHT = {
    "add": 1, "add_any": 1, "sub": 1, "mul": 1, "div": 2, "neg": 1,
    "abs": 1,
    "max": 1, "min": 1, "select_n": 1, "and": 1, "or": 1, "xor": 1,
    "not": 1, "sign": 1, "floor": 1, "ceil": 1, "round": 1,
    "shift_right_logical": 1, "shift_left": 1, "bitcast_convert_type": 0,
    "convert_element_type": 1, "clamp": 1, "integer_pow": 1,
    "square": 1, "sqrt": 2, "rsqrt": 2,
    "exp": 6, "log": 6, "log1p": 6, "tanh": 8, "logistic": 8,
    "sin": 8, "cos": 8, "erf": 6, "erf_inv": 6, "pow": 10,
}
_SKIP = {  # layout/no-op/bookkeeping primitives — no VPU element work
    "broadcast_in_dim", "reshape", "squeeze", "transpose", "slice",
    "dynamic_slice", "dynamic_update_slice", "concatenate", "iota",
    "stop_gradient", "copy", "pjit", "custom_jvp_call",
    "custom_vjp_call", "custom_vjp_call_jaxpr", "closed_call",
}


def count_vpu_work(jaxpr) -> dict:
    """Count elementwise VPU work (FMA-equivalent element-ops), MXU dot
    FLOPs and reduction elements of a closed jaxpr, recursively."""
    out = {"elem": 0.0, "mxu_flops": 0.0, "reduce": 0.0, "unknown": {}}

    def visit(jx):
        for eqn in jx.eqns:
            prim = eqn.primitive.name
            sub = (eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                   or eqn.params.get("fun_jaxpr"))
            if sub is not None:
                visit(getattr(sub, "jaxpr", sub))
                continue
            if prim in ("scan", "while", "cond"):
                raise ValueError(
                    "count_vpu_work expects an unrolled step jaxpr")
            if prim in _SKIP:
                continue
            if prim in ("dot_general",):
                out["mxu_flops"] += _mxu_flops(eqn)
                continue
            if prim in ("reduce_sum", "reduce_max", "reduce_min",
                        "reduce_prod", "argmax", "argmin"):
                out["reduce"] += float(np.prod(eqn.invars[0].aval.shape))
                continue
            w = _ELEM_WEIGHT.get(prim)
            osz = float(np.prod(eqn.outvars[0].aval.shape))
            if w is None:
                out["unknown"][prim] = out["unknown"].get(prim, 0) + osz
                w = 1
            out["elem"] += w * osz

    visit(jaxpr.jaxpr if hasattr(jaxpr, "jaxpr") else jaxpr)
    return out


def _mxu_flops(eqn):
    a = eqn.invars[0].aval.shape
    ((lc, _), (lb, _)) = eqn.params["dimension_numbers"]
    o = eqn.outvars[0].aval.shape
    k = int(np.prod([a[i] for i in lc]))
    return 2.0 * k * int(np.prod(o))


def fused_ablation_rates(problem, solver, *, K=131072, tile=4096,
                         unroll=2, reps=10):
    """Measured speed-of-light ladder on the REAL kernel structure.

    The isolated microbenchmarks above proved untrustworthy on this
    host (process-dependent 50x swings through the axon tunnel, round
    4), so the falsifiable ceiling is built by ABLATION instead: four
    Pallas kernels with the exact grid / tile / unrolled-time-loop
    shape of the fused training kernel, each adding one piece of the
    per-step work —

      noise        xi = normals((d, tile)); consume via a (1, tile) acc
      +euler       X <- X + b_T(X) dt + sigma xi sqrt(dt)
      +net         Z = z(t, X) (the MXU matmuls) and the adaptive drift
      +accum       the Y/KL/u_l2 accumulator algebra = the full forward

    All four run back-to-back in one process, so tunnel-state effects
    hit them equally.  The training step's structural ceiling is
    ``noise / 2`` (the custom-VJP backward replays the forward's PRNG
    stream, so every path-step's noise is drawn twice); the stage
    deltas attribute the remaining time.  Returns path-steps/s per
    stage.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..ansatz.transposed import make_transposed_apply
    from ..rollout.kernels import _normals_from_bits_erfinv

    d, N = problem.d, solver.N
    if N % unroll:
        unroll = 1
    dt = np.float32(solver.delta_t)
    sq_dt = np.float32(np.sqrt(solver.delta_t))
    sig = problem.sigma_struct
    leaves, z_apply_T = make_transposed_apply(
        solver.z_net, solver.params["z"])
    lshapes = [jnp.shape(x) for x in leaves]
    leaves = tuple(jnp.asarray(x).reshape(
        s if len(s) == 2 else (1, -1)) for x, s in zip(leaves, lshapes))
    n_tiles = pl.cdiv(K, tile)
    cp = pltpu.CompilerParams(dimension_semantics=("parallel",))

    def make(stage):
        def kernel(seed_ref, *refs):
            lrefs = refs[:len(leaves)]
            o_ref = refs[len(leaves)]
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            pvals = tuple(r[:].reshape(s)
                          for r, s in zip(lrefs, lshapes))
            X0 = jnp.zeros((d, tile), jnp.float32) + 0.1
            z = jnp.zeros((1, tile), jnp.float32)

            def body(n0, carry):
                X, acc = carry
                for j in range(unroll):
                    n = n0 * unroll + j
                    t = n.astype(jnp.float32) * dt
                    if stage == "full_nonoise":
                        # the decisive control: the full forward with
                        # generation removed (a step-dependent constant
                        # the compiler cannot hoist the work of)
                        xi = jnp.full((d, tile), 0.01, jnp.float32) * (
                            1.0 + 1e-6 * n.astype(jnp.float32))
                    elif stage == "full_rawbits":
                        # bits drawn but the erfinv transform skipped:
                        # attributes the noise cost between generation
                        # and transform
                        from jax.experimental.pallas import tpu as pt_
                        b = pt_.bitcast(
                            pt_.prng_random_bits((d, tile)), jnp.uint32)
                        xi = pt_.bitcast(
                            (b >> 9) | jnp.uint32(0x3F800000),
                            jnp.float32) - 1.5
                    elif stage == "full_binom":
                        from ..rollout.kernels import \
                            _normals_from_bits_binom
                        xi = _normals_from_bits_binom((d, tile))
                    else:
                        xi = _normals_from_bits_erfinv((d, tile))
                    if stage == "noise":
                        acc = acc + jnp.sum(xi, axis=0, keepdims=True)
                        continue
                    c = jnp.zeros((d, tile), jnp.float32)
                    Z = None
                    if stage in ("net", "full", "full_nonoise",
                                 "full_rawbits", "full_binom"):
                        tX = jnp.concatenate(
                            [jnp.zeros((1, tile), jnp.float32) + t, X],
                            axis=0)
                        Z = z_apply_T(pvals, tX)
                        c = -Z
                    X = (X + (problem.b_T(X) + sig.apply_cols(c)) * dt
                         + sig.apply_cols(xi) * sq_dt)
                    if stage == "net":
                        acc = acc + jnp.sum(Z * xi, axis=0, keepdims=True)
                    if stage in ("full", "full_nonoise",
                                  "full_rawbits", "full_binom"):
                        Zc = jnp.sum(Z * c, axis=0, keepdims=True)
                        Zxi = jnp.sum(Z * xi, axis=0, keepdims=True)
                        hv = problem.h_T(
                            t, X, jnp.zeros((tile,), jnp.float32),
                            Z).reshape(1, tile)
                        acc = acc + (-hv + Zc) * dt + Zxi * sq_dt
                return X, acc

            X, acc = lax.fori_loop(0, N // unroll, body, (X0, z))
            o_ref[:] = acc + jnp.sum(X, axis=0, keepdims=True)

        f = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=[pl.BlockSpec(x.shape,
                                       lambda i, *_, nd=x.ndim: (0,) * nd,
                                       memory_space=pltpu.VMEM)
                          for x in leaves],
                out_specs=pl.BlockSpec((1, tile), lambda i, *_: (0, i),
                                       memory_space=pltpu.VMEM)),
            out_shape=jax.ShapeDtypeStruct((1, n_tiles * tile),
                                           jnp.float32),
            compiler_params=cp)
        return jax.jit(lambda s: f(s, *leaves))

    # Round-robin x best-of: the tunnel shows multi-second degraded
    # windows that would otherwise bias whichever stage ran inside one
    # (round 4: a 'noise'-only stage once measured SLOWER than the full
    # forward).  Three interleaved rounds, keep the best rate per stage.
    out, fns = {}, {}
    s = jnp.asarray([11], jnp.int32)
    for stage in ("noise", "euler", "net", "full",
                  "full_nonoise", "full_rawbits", "full_binom"):
        try:
            fns[stage] = make(stage)
            jax.block_until_ready(fns[stage](s))
        except Exception as e:  # surface, don't die
            out[stage] = None
            out[f"{stage}_error"] = repr(e)[:200]
    for _ in range(3):
        for stage, f in fns.items():
            t0 = time.perf_counter()
            for _ in range(reps):
                o = f(s)
            jax.block_until_ready(o)
            dtm = (time.perf_counter() - t0) / reps
            out[stage] = max(out.get(stage) or 0.0, K * N / dtm)
    return out


def fused_train_vpu_roofline(problem, solver, *, fma_rate=None,
                             normals_rate=None, micro_kw=None):
    """VPU-roofline path-steps/s ceiling of the fused TRAINING step.

    Traces the fused kernel's own step math (forward) and its per-step
    VJP replay (backward) at the solver's resolved tile, counts the
    VPU element work and PRNG draws per time step, and charges them at
    the measured microkernel rates:

        t_step >= (normals_fwd + normals_bwd) / R_normals
                  + (elem_fwd + elem_bwd + reduces) / (R_fma / 2)

    (R_fma counts 2 flops per element-FMA; generic elementwise ops
    retire ~1 element/cycle/lane like the FMA loop, so the element
    rate is R_fma / 2.)  Returns a dict with the machine rates, the
    per-path-step work decomposition, the ceiling, and nothing solver-
    specific baked in — callers divide their measured throughput by
    ``roofline_path_steps_per_sec``.
    """
    from ..ansatz.transposed import make_transposed_apply

    d, N = problem.d, solver.N
    tile = 4096
    leaves_ex, z_apply_T = make_transposed_apply(
        solver.z_net, solver.params["z"])
    dt = np.float32(solver.delta_t)
    sq_dt = np.float32(np.sqrt(solver.delta_t))
    sig = problem.sigma_struct

    def step_math(XT, t, xi, *params):
        T_ = XT.shape[1]
        tX = jnp.concatenate(
            [jnp.zeros((1, T_), jnp.float32) + t, XT], axis=0)
        Z = z_apply_T(tuple(params), tX)
        c = -jax.lax.stop_gradient(Z)
        X_new = jax.lax.stop_gradient(
            XT + (problem.b_T(XT) + sig.apply_cols(c)) * dt
            + sig.apply_cols(xi) * sq_dt)
        Zc = jnp.sum(Z * c, axis=0, keepdims=True)
        Zxi = jnp.sum(Z * xi, axis=0, keepdims=True)
        hv = problem.h_T(t, X_new, jnp.zeros((T_,), jnp.float32),
                         Z).reshape(1, T_)
        a = (-hv + Zc) * dt + Zxi * sq_dt
        return X_new, a

    def bwd_math(XT, t, xi, gy, *params):
        def of_params(*ps):
            return step_math(XT, t, xi, *ps)
        (X_new, _), pull = jax.vjp(of_params, *params)
        grads = pull((jnp.zeros_like(XT), gy))
        return (X_new,) + tuple(grads)

    X_ex = jax.ShapeDtypeStruct((d, tile), jnp.float32)
    t_ex = jax.ShapeDtypeStruct((), jnp.float32)
    g_ex = jax.ShapeDtypeStruct((1, tile), jnp.float32)
    leaves = tuple(jax.ShapeDtypeStruct(x.shape, x.dtype)
                   for x in leaves_ex)
    fwd_j = jax.make_jaxpr(step_math)(X_ex, t_ex, X_ex, *leaves)
    bwd_j = jax.make_jaxpr(bwd_math)(X_ex, t_ex, X_ex, g_ex, *leaves)
    wf, wb = count_vpu_work(fwd_j), count_vpu_work(bwd_j)

    micro_kw = micro_kw or {}
    if fma_rate is None:
        fma_rate = vpu_fma_rate(**micro_kw)
    if normals_rate is None:
        normals_rate = prng_normals_rate(**micro_kw)

    # per path-step (divide the per-(d, tile)-step counts by tile):
    # normals are drawn once in the forward and once again in the
    # backward's replay (the custom VJP re-runs the same PRNG stream)
    normals_per_ps = 2.0 * d
    elem_per_ps = (wf["elem"] + wb["elem"]
                   + wf["reduce"] + wb["reduce"]) / tile
    elem_rate = fma_rate / 2.0
    t_ps = normals_per_ps / normals_rate + elem_per_ps / elem_rate
    return {
        "vpu_fma_flops_per_sec": fma_rate,
        "prng_normals_per_sec": normals_rate,
        "normals_per_path_step": normals_per_ps,
        "elem_ops_per_path_step": elem_per_ps,
        "fwd_elem_per_tile_step": wf["elem"] + wf["reduce"],
        "bwd_elem_per_tile_step": wb["elem"] + wb["reduce"],
        "unknown_prims": {**wf["unknown"], **wb["unknown"]},
        "roofline_path_steps_per_sec": 1.0 / t_ps,
    }
