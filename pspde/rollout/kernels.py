"""Pallas TPU kernels for the SDE rollout hot paths.

``fused_controlled_rollout`` runs the ENTIRE N-step controlled
Euler-Maruyama simulation inside one Pallas kernel: the (K_tile, d) path
state, the control-network weights and the Ito/Riemann accumulators stay
resident in VMEM for all N steps, so the loop performs zero HBM traffic
(the XLA scan implementation round-trips the carry through HBM every
step).  Noise is generated in-kernel with the TPU PRNG
(pltpu.prng_random_bits) and an erf_inv transform (round 3; the original
Box-Muller map is kept for reference — its log/cos cost ~2x more VPU
time at the bench shapes).

This is the "serve" path of the framework — the importance-sampling
application of a learned control (utilities.py:287-359 in the reference,
where it is an eager Python loop over torch ops) — and the forward pass
of training-free diagnostics.  Grid = K tiles; each program integrates
its tile through all N steps.

Supported: any state-independent sigma and any drift / control
expressible in jnp ops (they trace into the kernel; closed-over arrays
are hoisted to kernel inputs automatically).  Falls back to a jnp
``lax.scan`` on non-TPU backends.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False


class ISRolloutOut(NamedTuple):
    X: jnp.ndarray       # (K, d) final controlled state
    ito: jnp.ndarray     # (K,) int u . dW
    riemann: jnp.ndarray  # (K,) int |u|^2 dt
    f_int: jnp.ndarray   # (K,) int f dt along the controlled path


def _normals_from_bits(shape):
    """Box-Muller on TPU PRNG bits -> standard normals of ``shape``."""
    # bitcast to uint32 BEFORE shifting: the raw bits lower as int32 and
    # an arithmetic >> would sign-extend into the exponent field
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # uniforms in [1, 2) from mantissa bits, then shift to [0, 1)
    u1 = pltpu.bitcast((bits1 >> 9) | jnp.uint32(0x3F800000),
                       jnp.float32) - 1.0
    u2 = pltpu.bitcast((bits2 >> 9) | jnp.uint32(0x3F800000),
                       jnp.float32) - 1.0
    r = jnp.sqrt(-2.0 * jnp.log(1.0 - u1 + 1e-12))
    return r * jnp.cos(2.0 * np.pi * u2)


def _normals_from_bits_erfinv(shape):
    """One-draw normals: uniform(-1, 1) -> sqrt(2) * erf_inv(u).

    Half the PRNG bits and none of the log/cos of Box-Muller — the same
    bits->normal map XLA's own RngBitGenerator lowering uses.  Measured
    (r3): the Box-Muller variant's transcendentals are a first-order cost
    of the fused training kernel at (d, K) = (100, 131072)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    u01 = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000),
                        jnp.float32) - 1.0          # [0, 1)
    u = jnp.clip(2.0 * u01 - 1.0, -1.0 + 1e-7, 1.0 - 1e-7)
    return np.float32(np.sqrt(2.0)) * lax.erf_inv(u)


_BINOM_SCALE = np.float32(1.0 / np.sqrt(8.0 + 1.0 / 12.0))


def _normals_from_bits_binom(shape):
    """Moment-matched CHEAP normals (``rng='binom'``): popcount-binomial
    plus a uniform dither,

        z = (popcount(b1) - 16 + u15(b2) - 1/2) / sqrt(8 + 1/12).

    Exact mean/variance/skewness; excess kurtosis -1/16 / (8+1/12)^0 ~
    -0.061 (measured on-chip: kurt 2.9385); continuous (the dither
    fills the binomial's unit steps); |z| <= 5.8 sigma.  For the Euler
    scheme's WEAK error only the first three moments enter at O(dt), so
    training statistics are unchanged at the discretization order —
    this replaces the erf_inv quantile map, which the round-4 in-situ
    ablation (utils/roofline.py: full vs full_rawbits) measured at ~48%
    of the fused forward's time.  Training-only opt-in; the serve /
    diagnostics paths keep exact normals."""
    b1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    b2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    pc = lax.population_count(b1)
    u = ((b2 & jnp.int32(0x7FFF)).astype(jnp.float32)
         * np.float32(2.0 ** -15))
    return ((pc - 16).astype(jnp.float32) + u - 0.5) * _BINOM_SCALE


def fused_controlled_rollout(
    problem,
    u_apply: Callable,        # (param_leaves_tuple, tX (K, d+1)) -> u (K, d)
    param_leaves,             # tuple of jnp arrays (control net weights)
    K: int,
    N: int,
    delta_t: float,
    seed: int,
    with_f: bool = True,
    tile: int = 512,
    interpret: bool = False,
    host_noise: "jnp.ndarray | None" = None,  # (N, K, d): test/CPU mode
    vmem_budget_bytes: int = 96 * 2**20,      # ~3/4 of a v5e core's VMEM
    collect_path: bool = False,   # also return the (N, K, d) pre-step path
    noise_sign: float = 1.0,      # compile-time xi multiplier (antithetic)
    unroll: "int | None" = None,  # time-loop unroll (None = 2 if N even;
                                  # see make_fused_train_rollout)
):
    """Simulate dX_u = (b(X_u) + sigma u) dt + sigma dW with
    u = u_apply(params, [t, X_u]) and accumulate the Girsanov integrals.

    sigma must be STATE-INDEPENDENT (``problem.sigma_struct`` applied as a
    constant matrix/diagonal).  The kernel keeps the weights and one path
    tile resident in VMEM; the tile is auto-shrunk when the estimated
    footprint exceeds ``vmem_budget_bytes`` and a ValueError (with the
    estimate) is raised when the weights alone cannot fit.

    ``noise_sign`` multiplies every noise draw (hardware-PRNG or
    ``host_noise``) by a compile-time constant: two calls with the SAME
    seed and signs +1/-1 simulate exactly mirrored (antithetic) noise
    pairs, elementwise aligned across the path axis."""
    d = problem.d
    sig = problem.sigma_struct
    dt = np.float32(delta_t)
    sq_dt = np.float32(np.sqrt(delta_t))

    # -- VMEM guardrail: weights + consts are fully resident, plus per-tile
    # state/activations (and the whole (N, tile, d) noise block in
    # host-noise mode).  Auto-shrink the tile to fit; raise a clear error
    # when the resident weights alone cannot fit.
    weight_bytes = sum(int(np.prod(x.shape)) * 4 for x in param_leaves)
    hidden_out = sum(int(x.shape[-1]) for x in param_leaves
                     if getattr(x, "ndim", 0) >= 2)

    def _pad(n, m):
        return -(-n // m) * m

    # Output blocks are double-buffered on the scoped VMEM *stack*, whose
    # limit (~16 MiB on v5e) is far below total VMEM, and the TPU (8, 128)
    # tiling lane-pads the last dim — a (N, tile, d=10) path block
    # physically occupies N * tile * 128 f32 lanes.
    scoped_budget = 12 * 2**20

    def scoped_estimate(t):
        out = 2 * 4 * _pad(t, 8) * out_w
        path = (2 * 4 * N * _pad(t, 8) * _pad(d, 128)) if collect_path else 0
        return out + path

    def vmem_estimate(t):
        # X, xi, tX, u, acc + concat-skip activations (2x hidden widths),
        # double-buffered output tile; 4-byte f32 everywhere
        act = 4 * t * (2 * hidden_out + 6 * d + 16)
        noise = 4 * N * t * d if host_noise is not None else 0
        return weight_bytes + act + noise + scoped_estimate(t)

    out_w = _pad(d + 3, 128)
    while tile > 8 and (vmem_estimate(tile) > vmem_budget_bytes
                        or scoped_estimate(tile) > scoped_budget):
        tile //= 2
    if collect_path and scoped_estimate(tile) > scoped_budget:
        raise ValueError(
            "fused_controlled_rollout(collect_path=True): the (N, tile, d) "
            f"path block needs {scoped_estimate(tile) / 2**20:.1f} MiB of "
            "scoped VMEM even at tile=8 (N too large for the fused "
            "training kernel) - use rollout_mode='batched_grad'.")
    if vmem_estimate(tile) > vmem_budget_bytes:
        raise ValueError(
            "fused_controlled_rollout: estimated VMEM footprint "
            f"{vmem_estimate(tile) / 2**20:.1f} MiB (weights "
            f"{weight_bytes / 2**20:.1f} MiB) exceeds the "
            f"{vmem_budget_bytes / 2**20:.0f} MiB budget even at tile=8; "
            "the control net is too large for the fused kernel - use the "
            "scan path (eval.importance_sampling).")

    n_tiles = pl.cdiv(K, tile)
    if unroll is None:
        unroll = 2 if N % 2 == 0 else 1
    if unroll < 1 or N % unroll:
        raise ValueError(f"unroll={unroll} must divide N={N}")

    def f_eval(x, t):
        if not with_f:
            return jnp.zeros((x.shape[0],), dtype=jnp.float32)
        f = getattr(problem, "f", None)
        if f is None:
            return jnp.zeros((x.shape[0],), dtype=jnp.float32)
        try:
            return f(x, t)
        except TypeError:
            return f(x)

    # One fused EM step as a pure function; closure_convert hoists every
    # array the problem/ansatz closes over (drift matrices, sigma
    # diagonals, X_0, ...) into explicit kernel inputs, which Pallas
    # requires.
    def step_math(X, t, xi, *params):
        tX = jnp.concatenate(
            [jnp.full((X.shape[0], 1), 0.0, jnp.float32) + t, X], axis=1)
        u = u_apply(tuple(params), tX)
        X_new = (X + (problem.b(X) + sig.apply(u)) * dt
                 + sig.apply(xi) * sq_dt)
        fv = f_eval(X_new, t)
        return X_new, u, fv

    # Hoist every array constant the problem/ansatz closes over into
    # explicit kernel inputs: trace the step to a jaxpr, turn its
    # constvars into invars (closure_convert only hoists tracers, not
    # literal jnp constants, so it misses e.g. drift matrices).
    from jax.extend.core import ClosedJaxpr, jaxpr_as_fun

    X_ex = jax.ShapeDtypeStruct((tile, d), jnp.float32)
    t_ex = jax.ShapeDtypeStruct((), jnp.float32)
    # shape/dtype only (cf. make_fused_train_rollout): concrete leaves may
    # carry a NamedSharding that would clash with shard_map tracers
    leaves_sds = tuple(jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
                       for x in param_leaves)
    cj = jax.make_jaxpr(step_math)(X_ex, t_ex, X_ex, *leaves_sds)
    consts = [jnp.asarray(c) for c in cj.consts]
    open_jaxpr = cj.jaxpr.replace(
        invars=list(cj.jaxpr.constvars) + list(cj.jaxpr.invars),
        constvars=[])
    step_open = jaxpr_as_fun(ClosedJaxpr(open_jaxpr, ()))

    def step_closed(X, t, xi, *extra):
        cvals = extra[len(param_leaves):]
        pvals = extra[:len(param_leaves)]
        return step_open(*cvals, X, t, xi, *pvals)

    raw_inputs = list(param_leaves) + list(consts) + [
        problem.X_0.astype(jnp.float32)[None, :]]
    # canonicalize to 2-d so every weight/constant gets a full-array VMEM
    # block (Mosaic only loads from VMEM/SMEM refs)
    in_shapes = [x.shape for x in raw_inputs]
    inputs = [jnp.asarray(x).reshape(
        x.shape if getattr(x, "ndim", 0) == 2 else (1, -1))
        for x in raw_inputs]
    n_in = len(inputs)

    use_host_noise = host_noise is not None
    if use_host_noise:
        pad = n_tiles * tile - K
        hn = jnp.pad(jnp.asarray(host_noise, dtype=jnp.float32),
                     ((0, 0), (0, pad), (0, 0)))
        inputs = inputs + [hn]

    # Single lane-aligned output (out_w above): columns [0, d) hold X, the
    # next three columns the Ito / Riemann / f accumulators, padded up to a
    # multiple of 128 lanes.  Separate (K, 1) outputs would be lane-padded
    # 128x by the TPU (8, 128) tiling, wasting HBM and VMEM.
    def kernel(seed_ref, *refs):
        in_refs = refs[:n_in]
        k = n_in
        noise_ref = None
        if use_host_noise:
            noise_ref = refs[k]
            k += 1
        else:
            pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        out_ref = refs[k]
        path_ref = refs[k + 1] if collect_path else None
        extra = tuple(r[:].reshape(in_shapes[j])
                      for j, r in enumerate(in_refs[:-1]))

        X0 = jnp.broadcast_to(
            in_refs[-1][:].reshape(in_shapes[-1]), (tile, d))
        acc0 = jnp.zeros((tile, 3), dtype=jnp.float32)

        def body(n0, carry):
            X, acc = carry
            for j in range(unroll):   # manual unroll (static offsets)
                n = n0 * unroll + j
                t = n.astype(jnp.float32) * dt
                if use_host_noise:
                    xi = noise_ref[n]
                else:
                    xi = _normals_from_bits_erfinv((tile, d))
                if noise_sign != 1.0:
                    xi = jnp.float32(noise_sign) * xi
                if collect_path:
                    # pre-step state: X_path[n] = X_n (the state the
                    # control was evaluated at)
                    path_ref[pl.ds(n, 1)] = X[None]
                X, u, fv = step_closed(X, t, xi, *extra)
                d_acc = jnp.stack(
                    [jnp.sum(u * xi, axis=-1) * sq_dt,
                     jnp.sum(u * u, axis=-1) * dt,
                     fv * dt], axis=-1)
                acc = acc + d_acc
            return X, acc

        X, acc = lax.fori_loop(0, N // unroll, body, (X0, acc0))
        out_ref[:, :d] = X
        out_ref[:, d:d + 3] = acc
        if out_w > d + 3:
            out_ref[:, d + 3:] = jnp.zeros((tile, out_w - d - 3),
                                           dtype=jnp.float32)

    out_shapes = jax.ShapeDtypeStruct((n_tiles * tile, out_w), jnp.float32)
    in_specs = [pl.BlockSpec(x.shape, lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM)
                for x in inputs[:n_in]]
    if use_host_noise:
        in_specs.append(pl.BlockSpec((N, tile, d), lambda i, *_: (0, i, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = pl.BlockSpec((tile, out_w), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM)
    if collect_path:
        out_shapes = (out_shapes,
                      jax.ShapeDtypeStruct((N, n_tiles * tile, d),
                                           jnp.float32))
        out_specs = (out_specs,
                     pl.BlockSpec((N, tile, d), lambda i, *_: (0, i, 0),
                                  memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    compiler_params = None
    if not interpret:
        # mark the K-tile grid axis parallel so Mosaic streams the output
        # blocks instead of keeping every tile resident in VMEM
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=compiler_params,
    )(jnp.asarray([seed], dtype=jnp.int32), *inputs)
    if collect_path:
        out, path = out
        named = ISRolloutOut(out[:K, :d], out[:K, d], out[:K, d + 1],
                             out[:K, d + 2])
        return named, path[:, :K, :]
    return ISRolloutOut(out[:K, :d], out[:K, d], out[:K, d + 1],
                        out[:K, d + 2])


class FusedTrainOut(NamedTuple):
    XT: jnp.ndarray     # (d, K) final state, COLUMN layout
    Y: jnp.ndarray      # (K,) accumulated value increments (excl. Y_0)
    Z_sum: jnp.ndarray  # (K,) KL / Ito accumulator
    u_l2: jnp.ndarray   # (K,) control-error accumulator


def _closure_convert(fn, *example):
    """Trace ``fn`` to a jaxpr and turn its constvars into invars: Pallas
    kernels receive every array as an explicit VMEM ref, so arrays the
    problem/ansatz close over (drift matrices, sigma diagonals, lookup
    tables) must become kernel inputs.  (jax's closure_convert only
    hoists tracers, not literal jnp constants.)"""
    from jax.extend.core import ClosedJaxpr, jaxpr_as_fun
    cj = jax.make_jaxpr(fn)(*example)
    consts = [jnp.asarray(c) for c in cj.consts]
    open_jaxpr = cj.jaxpr.replace(
        invars=list(cj.jaxpr.constvars) + list(cj.jaxpr.invars),
        constvars=[])
    return jaxpr_as_fun(ClosedJaxpr(open_jaxpr, ())), consts


def _canon2d(xs):
    """Canonicalize arrays to 2-d (Mosaic loads full-array VMEM blocks);
    returns (2-d arrays, original shapes)."""
    shapes = [tuple(jnp.shape(x)) for x in xs]
    arrs = [jnp.asarray(x).reshape(
        s if len(s) == 2 else (1, -1) if s else (1, 1))
        for x, s in zip(xs, shapes)]
    return arrs, shapes


def make_fused_train_rollout(
    problem,
    z_apply_T: Callable,      # (param_leaves_tuple, tXT (d+1, T)) -> (d, T)
    example_leaves,           # tuple of f32 arrays (control-net weights)
    K: int,
    N: int,
    delta_t: float,
    *,
    adaptive_forward: bool = True,
    accumulate_kl: bool = False,
    kl_ito_term: bool = False,
    u_tab=None,               # (N, d) state-independent reference control
    tile: "int | None" = None,  # None = default 4096 (an explicit value is
                              # a user request: warn if it must be capped)
    interpret: bool = False,
    host_noise=None,          # (N, d, K) f32: test/CPU mode
    rng: str = "binom",       # in-kernel bits->noise map: 'binom'
                              # (default, moment-matched binomial — weak-
                              # order equivalent and the measured winner:
                              # round-5 LLGC d=100 20k-iter endpoints
                              # u_L2 0.0305/IS 0.054 vs erfinv's
                              # 0.0327/0.079 at 1.49x less wall-clock),
                              # 'erfinv' (exact normals), or 'boxmuller'
    noise_sign: float = 1.0,  # compile-time xi multiplier: two kernels
                              # built with the SAME seed and signs +1/-1
                              # yield mirrored path pairs (antithetic
                              # training, cf. the serve kernel's
                              # noise_sign); applies to host_noise too
                              # so sign/noise-negation equivalence is
                              # testable bitwise
    unroll: "int | None" = None,  # time-loop unroll factor (must divide
                              # N; manual unroll — Mosaic's fori_loop only
                              # supports unroll=1 or full).  None = auto:
                              # 2 when N is even (measured r3: u2 overlaps
                              # step n+1's PRNG/VPU work with step n's
                              # narrow matmuls, 222 -> 230M path-steps/s;
                              # u4+/tile 4096 exceeds the compiler's VMEM
                              # budget and deeper unrolls plateau at 230M)
):
    """Fully-fused TRAINING rollout with a custom VJP: forward AND
    backward each run as ONE Pallas kernel per call, with zero
    per-step HBM traffic.

    Exploits the structure of the detached-forward control-mode rollout
    (rollout/sde.py: hjb_rollout_batched_grad's derivation): with
    ``detach_forward`` and y-free h, Y decomposes into per-step increments
    a_n that depend on the parameters only through Z_n = z(t_n, X_n), and
    every a_n receives the SAME per-path cotangent dL/dY_k.  The backward
    pass therefore needs no reverse-time sweep: it REPLAYS the forward
    path (identical in-kernel TPU PRNG stream, seeded per tile) while
    accumulating sum_k gY_k * da_{n,k}/dtheta via a traced per-step VJP —
    residuals are just (params, seed), so HBM traffic is parameters +
    (K,)-vectors in and tiny per-tile gradients out.

    Layout: the path tile lives TRANSPOSED in VMEM as (d, tile-lanes)
    columns, so every net matmul runs with the batch in the lane
    dimension (ansatz/transposed.py layout note; the row-major variant
    wastes >75% of MXU lanes on 30-wide outputs).  Requires the
    transposed-coefficient protocol on the problem (base.py: b_T / h_T /
    f_T) and a column-layout net evaluator (ansatz/transposed.py:
    make_transposed_apply).

    The measured r2 fused kernel (``fused_controlled_rollout`` +
    batched-grad assembly) lost 2x to the XLA scan because it streamed
    the whole (N, K, d) path stack through scoped VMEM; this kernel
    stores no path at all.

    Semantics match rollout/sde.py: hjb_rollout with detach_forward
    (solver.py:449-494 step order) except the noise stream: in-kernel TPU
    PRNG (Box-Muller) instead of fold_in-threefry — statistically, not
    bitwise, equivalent.  ``host_noise`` injects an explicit (N, d, K)
    stream for bitwise tests.  The X chain and u_l2 are detached by
    construction (their cotangents are discarded), exactly as
    ``detach_forward`` prescribes.

    Returns ``run(leaves, seed_f32) -> FusedTrainOut``; differentiable in
    ``leaves``.
    """
    d = problem.d
    sig = problem.sigma_struct
    dt = np.float32(delta_t)
    sq_dt = np.float32(np.sqrt(delta_t))
    _normals = {"erfinv": _normals_from_bits_erfinv,
                "boxmuller": _normals_from_bits,
                "binom": _normals_from_bits_binom}[rng]
    if noise_sign != 1.0:   # antithetic mirror: same seed, flipped draws
        _base_normals = _normals
        _normals = lambda shape: np.float32(noise_sign) * _base_normals(
            shape)
    have_u = u_tab is not None
    # (N, d): the reference-control row for step n is fetched by a
    # leading-dim dynamic slice (Mosaic cannot dynamically slice the lane
    # dimension).  Kept as a ROW, not a (d, 1) column: a size-1 lane dim
    # pads to 128 in VMEM, so the column table costs N*d*128*4 bytes
    # (102 MB at the d=1000/N=200 BASELINE config — the round-3 Mosaic
    # failure); the row table is N*d*4 and the u_l2 cross term becomes a
    # (1, d) x (d, tile) MXU matvec (see step_math).
    u_tab2 = (jnp.asarray(u_tab, jnp.float32).reshape(N, d) if have_u
              else jnp.zeros((N, d), jnp.float32))
    # shape/dtype only: concrete example leaves may carry a NamedSharding
    # (e.g. tp-sharded params), which make_jaxpr would bake into the traced
    # avals and clash with the shard_map (Manual) mesh of the sharded
    # wrapper's kernel tracers
    example_leaves = tuple(
        jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
        for x in example_leaves)
    n_leaves = len(example_leaves)
    use_host_noise = host_noise is not None

    # -- VMEM guardrail: weights + a handful of (d, tile) f32 buffers
    # (X, xi, tX, Z, vjp intermediates ~ 3x forward) per resident tile.
    weight_bytes = sum(int(np.prod(x.shape)) * 4 for x in example_leaves)
    hidden_rows = sum(int(x.shape[-1]) for x in example_leaves
                      if getattr(x, "ndim", 0) >= 2)

    def vmem_estimate(t):
        bufs = 4 * t * (8 * d + 4 * hidden_rows + 64)
        noise = 4 * N * d * t if use_host_noise else 0
        return 2 * weight_bytes + bufs + noise

    if unroll is None:
        unroll = 2 if N % 2 == 0 else 1
    if unroll < 1 or N % unroll:
        raise ValueError(f"unroll={unroll} must divide N={N}")
    # Scoped-VMEM calibration: the compile-helper OOM-crashes (not a
    # catchable ValueError... on this host it surfaces as an HTTP-500
    # JaxRuntimeError from the remote compile helper) when the unrolled
    # step's live (d, tile) buffer set exceeds Mosaic's ~16 MiB scoped
    # budget.  Measured fit boundary on v5e (round 4, after the u_tab
    # row-table fix removed the spurious 102 MB column buffer):
    #   compiles: d=100/t4096/u2 (409600), d=300/t1664/u2 (499200),
    #             d=1000/t384/u2 (384000), d=1000/t512/u1 (512000)
    #   crashes:  d=100/t8192/u2, d=100/t4096/u4, d=300/t4096/u2,
    #             d=1000/t512/u2 (512000), d=1000/t768/u1 (768000)
    # Model: d * tile * ceil(unroll / 2) <= 499200 — software
    # pipelining overlaps unroll pairs, so u1 and u2 share a live set
    # while u4 doubles it.  (Lane dim kept a multiple of 128.)
    cal = 499_200
    max_tile = max(
        128, (cal // max(1, d * ((unroll + 1) // 2))) // 128 * 128)
    tile_requested = tile is not None   # ADVICE r4: intent, not value
    if tile is None:
        tile = 4096
    if tile > max_tile:
        if tile_requested:  # an explicitly requested tile is being capped
            import warnings
            warnings.warn(
                "fused_train_rollout: requested tile=%d exceeds the "
                "d*tile*unroll scoped-VMEM calibration at d=%d, unroll=%d;"
                " capped to %d" % (tile, d, unroll, max_tile))
        tile = max_tile
    while tile > 128 and vmem_estimate(tile) > 96 * 2**20:
        # shrink on the lane dim: keep it a multiple of 128 (the cap's own
        # invariant — plain halving of a non-power-of-two cap like 1280
        # would yield 640 -> 320, violating Mosaic's lane tiling)
        tile = max(128, (tile // 2) // 128 * 128)
    if vmem_estimate(tile) > 96 * 2**20:
        raise ValueError(
            "fused_train_rollout: VMEM estimate %.1f MiB exceeds budget "
            "even at tile=128 (net too large) - use the scan path."
            % (vmem_estimate(tile) / 2**20))
    n_tiles = pl.cdiv(K, tile)
    Kp = n_tiles * tile

    # ---- step math (traced, then closure-converted into the kernels) ----
    def step_math(XT, t, u_row, xi, *params):
        T_ = XT.shape[1]
        tX = jnp.concatenate(
            [jnp.zeros((1, T_), jnp.float32) + t, XT], axis=0)
        Z = z_apply_T(tuple(params), tX)
        if adaptive_forward:
            c = -lax.stop_gradient(Z)
        else:
            c = jnp.zeros_like(Z)
        X_new = lax.stop_gradient(
            XT + (problem.b_T(XT) + sig.apply_cols(c)) * dt
            + sig.apply_cols(xi) * sq_dt)
        Zc = jnp.sum(Z * c, axis=0, keepdims=True)
        Zxi = jnp.sum(Z * xi, axis=0, keepdims=True)
        # y-free h is a requirement of this kernel's gradient
        # derivation (solver gate: problem.h_is_y_free)
        hv = problem.h_T(t, X_new, jnp.zeros((T_,), jnp.float32),
                         Z).reshape(1, T_)
        a = (-hv + Zc) * dt + Zxi * sq_dt
        kl = jnp.zeros_like(a)
        if accumulate_kl:
            fv = problem.f_T(X_new, t).reshape(1, T_)
            kl = (0.5 * jnp.sum(Z * Z, axis=0, keepdims=True) + fv) * dt
            if kl_ito_term:
                kl = kl - Zxi * sq_dt
        ul2 = jnp.zeros_like(a)
        if have_u:
            # |−Z − u|² expanded so the reference control stays a (1, d)
            # row: Σ_e(Z+u)² = ΣZ² + 2·(u @ Z) + |u|² — the cross term is
            # an MXU matvec, no (d, 1) column relayout needed
            Zs = lax.stop_gradient(Z)
            # HIGHEST precision: at default precision the MXU truncates
            # the f32 inputs to bf16, and since the three expanded terms
            # cancel near convergence (Z ~ -u) the diagnostic would gain
            # an O(0.1-1%) error floor (ADVICE r4); the (1, d) x (d, tile)
            # matvec is negligible next to the net matmuls
            ul2 = (jnp.sum(Zs * Zs, axis=0, keepdims=True)
                   + 2.0 * jnp.dot(u_row, Zs,
                                   precision=lax.Precision.HIGHEST)
                   + jnp.sum(u_row * u_row)) * dt
        return X_new, a, kl, ul2

    def bwd_math(XT, t, u_row, xi, gy, gkl, *params):
        def of_params(*ps):
            X_new, a, kl, _ = step_math(XT, t, u_row, xi, *ps)
            return X_new, a, kl
        (X_new, _, _), pull = jax.vjp(of_params, *params)
        grads = pull((jnp.zeros_like(XT), gy, gkl))
        return (X_new,) + tuple(grads)

    from jax.extend.core import ClosedJaxpr, jaxpr_as_fun

    X_ex = jax.ShapeDtypeStruct((d, tile), jnp.float32)
    t_ex = jax.ShapeDtypeStruct((), jnp.float32)
    u_ex = jax.ShapeDtypeStruct((1, d), jnp.float32)
    g_ex = jax.ShapeDtypeStruct((1, tile), jnp.float32)

    def _closure_convert(fn, *example):
        cj = jax.make_jaxpr(fn)(*example)
        consts = [jnp.asarray(c) for c in cj.consts]
        open_jaxpr = cj.jaxpr.replace(
            invars=list(cj.jaxpr.constvars) + list(cj.jaxpr.invars),
            constvars=[])
        return jaxpr_as_fun(ClosedJaxpr(open_jaxpr, ())), consts

    fwd_open, fwd_consts = _closure_convert(
        step_math, X_ex, t_ex, u_ex, X_ex, *example_leaves)
    bwd_open, bwd_consts = _closure_convert(
        bwd_math, X_ex, t_ex, u_ex, X_ex, g_ex, g_ex, *example_leaves)

    def _canon(xs):
        shapes = [x.shape for x in xs]
        arrs = [jnp.asarray(x).reshape(
            x.shape if getattr(x, "ndim", 0) == 2 else (1, -1)) for x in xs]
        return arrs, shapes

    X0col = problem.X_0.astype(jnp.float32).reshape(d, 1)
    hn = None
    if use_host_noise:
        hn = jnp.pad(jnp.asarray(host_noise, jnp.float32),
                     ((0, 0), (0, 0), (0, Kp - K)))
        if noise_sign != 1.0:
            hn = jnp.float32(noise_sign) * hn

    def full_spec(x):
        nd = len(x.shape)
        return pl.BlockSpec(x.shape, lambda i, *_: (0,) * nd,
                            memory_space=pltpu.VMEM)
    noise_spec = pl.BlockSpec((N, d, tile), lambda i, *_: (0, 0, i),
                              memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        # tiles are independent: let Mosaic stream/overlap the K grid
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",))

    # ------------------------------------------------------------- forward
    def _fwd(leaves, seed):
        consts2d, cshapes = _canon(list(leaves) + list(fwd_consts))
        inputs = consts2d + [u_tab2, X0col]
        if use_host_noise:
            inputs.append(hn)
        n_in = len(inputs)

        def kernel(seed_ref, *refs):
            in_refs = refs[:n_in]
            xt_out, acc_out = refs[n_in], refs[n_in + 1]
            noise_ref = in_refs[-1] if use_host_noise else None
            base = in_refs[:len(cshapes)]
            u_ref = in_refs[len(cshapes)]
            x0_ref = in_refs[len(cshapes) + 1]
            if not use_host_noise:
                pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            extra = tuple(r[:].reshape(cshapes[j])
                          for j, r in enumerate(base))
            X0 = jnp.broadcast_to(x0_ref[:], (d, tile))
            z = jnp.zeros((1, tile), jnp.float32)

            def body(n0, carry):
                X, aY, aK, aU = carry
                for j in range(unroll):   # manual unroll (static offsets)
                    n = n0 * unroll + j
                    t = n.astype(jnp.float32) * dt
                    xi = (noise_ref[n] if use_host_noise
                          else _normals((d, tile)))
                    u_row = u_ref[pl.ds(n, 1), :]
                    pvals = extra[:n_leaves]
                    cvals = extra[n_leaves:]
                    X, a, kl, ul2 = fwd_open(*cvals, X, t, u_row, xi,
                                             *pvals)
                    aY, aK, aU = aY + a, aK + kl, aU + ul2
                return X, aY, aK, aU

            X, aY, aK, aU = lax.fori_loop(0, N // unroll, body,
                                          (X0, z, z, z))
            xt_out[:] = X
            acc_out[0:1, :] = aY
            acc_out[1:2, :] = aK
            acc_out[2:3, :] = aU
            acc_out[3:, :] = jnp.zeros((5, tile), jnp.float32)

        in_specs = [full_spec(x) for x in inputs[:n_in]]
        if use_host_noise:
            in_specs[-1] = noise_spec
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((d, tile), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, tile), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM)),
            ),
            out_shape=(jax.ShapeDtypeStruct((d, Kp), jnp.float32),
                       jax.ShapeDtypeStruct((8, Kp), jnp.float32)),
            interpret=interpret,
            compiler_params=compiler_params,
        )(jnp.asarray([seed], jnp.int32), *inputs)
        XT, acc = out
        return FusedTrainOut(XT[:, :K], acc[0, :K], acc[1, :K],
                             acc[2, :K])

    # ------------------------------------------------------------ backward
    def _bwd(leaves, seed, gY, gKL):
        consts2d, cshapes = _canon(list(leaves) + list(bwd_consts))
        gY2 = jnp.pad(gY.astype(jnp.float32), (0, Kp - K)).reshape(
            n_tiles, tile)
        gK2 = jnp.pad(gKL.astype(jnp.float32), (0, Kp - K)).reshape(
            n_tiles, tile)
        inputs = consts2d + [u_tab2, X0col, gY2, gK2]
        if use_host_noise:
            inputs.append(hn)
        n_in = len(inputs)
        # grad accumulators use the same canonical 2-d layout _canon2d
        # gives the inputs: 2-d as-is, 0-d -> (1, 1), else (1, size)
        # (code review r5: (1, x.shape[0]) raised IndexError on 0-d
        # leaves and mis-sized rank>=3 leaves vs _canon2d's flattening)
        leaf_shapes = [tuple(x.shape) if x.ndim == 2
                       else (1, 1) if x.ndim == 0
                       else (1, int(np.prod(x.shape)))
                       for x in leaves]

        def kernel(seed_ref, *refs):
            in_refs = refs[:n_in]
            grad_refs = refs[n_in:]
            noise_ref = in_refs[-1] if use_host_noise else None
            base = in_refs[:len(cshapes)]
            u_ref = in_refs[len(cshapes)]
            x0_ref = in_refs[len(cshapes) + 1]
            gy_ref = in_refs[len(cshapes) + 2]
            gk_ref = in_refs[len(cshapes) + 3]
            if not use_host_noise:
                pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            extra = tuple(r[:].reshape(cshapes[j])
                          for j, r in enumerate(base))
            X0 = jnp.broadcast_to(x0_ref[:], (d, tile))
            # full-array refs (a (1, tile) block would violate the (8, 128)
            # sublane tiling); slice this tile's row dynamically
            gy = gy_ref[pl.ds(pl.program_id(0), 1), :]
            gk = gk_ref[pl.ds(pl.program_id(0), 1), :]
            g0 = tuple(jnp.zeros(s, jnp.float32) for s in leaf_shapes)

            def body(n0, carry):
                X = carry[0]
                gacc = carry[1:]
                for j in range(unroll):   # manual unroll (static offsets)
                    n = n0 * unroll + j
                    t = n.astype(jnp.float32) * dt
                    xi = (noise_ref[n] if use_host_noise
                          else _normals((d, tile)))
                    u_row = u_ref[pl.ds(n, 1), :]
                    pvals = extra[:n_leaves]
                    cvals = extra[n_leaves:]
                    outs = bwd_open(*cvals, X, t, u_row, xi, gy, gk,
                                    *pvals)
                    X = outs[0]
                    gacc = tuple(
                        ga + gn.reshape(s)
                        for ga, gn, s in zip(gacc, outs[1:], leaf_shapes))
                return (X,) + gacc

            out = lax.fori_loop(0, N // unroll, body, (X0,) + g0)
            for j, gref in enumerate(grad_refs):
                gref[:] = out[1 + j][None]

        in_specs = [full_spec(x) for x in inputs[:n_in]]
        if use_host_noise:
            in_specs[-1] = noise_spec
        out_specs = tuple(
            pl.BlockSpec((1,) + s, lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM) for s in leaf_shapes)
        out_shape = tuple(
            jax.ShapeDtypeStruct((n_tiles,) + s, jnp.float32)
            for s in leaf_shapes)
        per_tile = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=in_specs, out_specs=out_specs),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=compiler_params,
        )(jnp.asarray([seed], jnp.int32), *inputs)
        return tuple(
            g.sum(axis=0).reshape(l.shape)
            for g, l in zip(per_tile, leaves))

    # ------------------------------------------------- custom-VJP wrapper
    @jax.custom_vjp
    def run(leaves, seed_f32):
        return _fwd(leaves, seed_f32.astype(jnp.int32))

    def run_fwd(leaves, seed_f32):
        seed = seed_f32.astype(jnp.int32)
        return _fwd(leaves, seed), (leaves, seed)

    def run_bwd(res, ct):
        leaves, seed = res
        # detach_forward semantics: the X chain (and the stop-gradient
        # u_l2 diagnostic) carry no parameter cotangent; Y and Z_sum do.
        grads = _bwd(leaves, seed, ct.Y, ct.Z_sum)
        return grads, jnp.zeros((), jnp.float32)

    run.defvjp(run_fwd, run_bwd)
    run.tile = tile          # post-cap/shrink choice, for tests/tuning
    run.unroll = unroll
    return run


def make_fused_train_rollout_sharded(
    problem, z_apply_T, example_leaves, K, N, delta_t, *,
    mesh, axis="dp", **kw,
):
    """dp-sharded wrapper of :func:`make_fused_train_rollout`.

    GSPMD cannot partition a ``pallas_call``, so the fused training kernel
    is scaled over the path axis with ``jax.shard_map``: each device runs
    the kernel on its K/n_dp path shard (weights replicated in VMEM), and
    the transpose of the replicated-leaves input psums the per-shard
    parameter gradients over ICI — the same collective GSPMD inserts for
    the scan path's mean reduction.  Per-shard PRNG streams are kept
    disjoint WITHIN a call (the kernel seeds tile t of a call as
    ``seed + t``, so shards must be spaced by at least their tile count):
    shard i runs with ``seed + i * (K_local // 128)``, 128 being the
    kernel's minimum tile — an upper bound on its tile count that does not
    depend on the auto-shrunk tile size.  With ``n_dp == 1`` the mapping is
    the identity, so a 1-device mesh is bitwise identical to the unsharded
    kernel.  Across calls adjacent seed windows may overlap, exactly as the
    unsharded kernel's already do — harmless, the parameters differ.
    Seeds stay exact in f32: ``2**23 + n_dp * K_local/128 < 2**24``.

    ``host_noise`` (test mode) must be the PER-SHARD (N, d, K/n_dp) block;
    it is closed over and therefore identical on every shard — use it only
    for plumbing tests (sharded == unsharded-with-K/n_dp-paths).
    """
    if not any(ax == axis for ax in mesh.axis_names):
        raise ValueError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
    n_dp = mesh.shape[axis]
    if K % n_dp:
        raise ValueError(f"K={K} not divisible by mesh '{axis}'={n_dp}")
    from jax.sharding import PartitionSpec as P

    inner = make_fused_train_rollout(
        problem, z_apply_T, example_leaves, K // n_dp, N, delta_t, **kw)

    tiles_max = max(1, (K // n_dp) // 128)

    def shard_fn(leaves, seed_f):
        idx = lax.axis_index(axis).astype(jnp.float32)
        return inner(leaves, seed_f + idx * np.float32(tiles_max))

    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=FusedTrainOut(P(None, axis), P(axis), P(axis), P(axis)),
        check_vma=False)
    try:
        out.tile, out.unroll = inner.tile, inner.unroll
    except AttributeError:  # shard_map output may reject attributes
        pass
    return out


def jaxpr_mosaic_safe(fn, *example):
    """Conservative trace-time check that ``fn`` lowers to ops the fused
    kernels can run: no gathers / dynamic indexing / control flow (the
    FD-oracle reference solutions are interp-table lookups — gather —
    which Mosaic cannot lower; closed-form references are plain VPU
    math).  Used to gate the optional in-kernel v_ref diagnostic."""
    try:
        cj = jax.make_jaxpr(fn)(*example)
    except Exception:
        return False
    bad = {"gather", "scatter", "scatter-add", "scatter_add",
           "dynamic_slice", "dynamic_update_slice", "sort", "while",
           "scan", "cond", "argmin", "argmax"}

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name in bad:
                return False
            for v in eqn.params.values():
                for sub in (v if isinstance(v, (list, tuple)) else (v,)):
                    ij = getattr(sub, "jaxpr", None)
                    if ij is not None and not walk(ij):
                        return False
        return True

    return walk(cj.jaxpr)


class FusedStoppedOut(NamedTuple):
    XT: jnp.ndarray       # (d, K) state at stopping (or final) time, COLUMNS
    Y: jnp.ndarray        # (K,) accumulated masked value increments
    t: jnp.ndarray        # (K,) per-path elapsed time (general solver)
    stopped: jnp.ndarray  # (K,) f32 0/1 stopped flag
    hitting: jnp.ndarray  # (K,) number of active steps
    v_l2: jnp.ndarray     # (K,) accumulated V-vs-reference L2 error
    adv_steps: jnp.ndarray  # (K,) advanced steps taken (K_log numerator)


# Scoped-VMEM calibration product for the STOPPED training kernel,
# d * tile * ceil(unroll/2) <= cal (cf. the 499_200 boundary measured for
# the first-order HJB kernel).  The stopped kernel's step is one
# derivative deeper on both sides — the forward contains the value-net
# vjp (Z = sigma^T grad V) and the backward differentiates through it —
# so its live (d, tile) buffer set is larger.  Measured on v5e (round 5):
# the FORWARD compiles at the full HJB boundary (d=50/t9984 ~ 499k) but
# the BACKWARD's grad-of-grad live set crashes the compile helper above
# ~d*tile = 175k (d=50: t4096 OOMs, t3456 compiles; d=10: t16384 OOMs,
# t12288 = 122k compiles) — both kernels must share one tile (the
# per-tile PRNG replay), so the backward binds.
_STOPPED_CAL = 160_000


def make_fused_stopped_train_rollout(
    problem,
    terms_math: Callable,     # (leaves_tuple, XT (d, T), t_row (1, T)) ->
                              #   (V (1, T), ZT (d, T), h (1, T)):
                              #   value, Z = sigma^T grad V, and h evaluated
                              #   at the PRE-step state with y_in_h = V
    example_leaves,           # tuple of f32 arrays (value-net weights [+ lam])
    K: int,
    N: int,
    delta_t: float,
    *,
    inside_fn_T: Callable,    # (XT, XT_prop) -> (K,) bool domain test
    adaptive_forward: bool = False,
    time_stopping: bool = False,   # general solver: stop when t + dt > T
    v_ref_T=None,             # optional (XT,) -> (K,) in-kernel diagnostic
                              # (pass ONLY closed-form refs: FD lookup
                              # tables gather, which Mosaic cannot lower)
    tile: "int | None" = None,
    interpret: bool = False,
    host_noise=None,          # (N, d, K) f32: test/CPU mode
    rng: str = "erfinv",
    unroll: "int | None" = None,  # default 1: the second-order step's
                              # live set leaves no headroom for pipelined
                              # unroll pairs at useful tiles
):
    """Fully-fused TRAINING rollout for the STOPPED-path family with a
    custom VJP: forward AND backward each run as ONE Pallas kernel with
    zero per-step HBM traffic (VERDICT r4 item 1 — the engine behind the
    reference's flagship diffusion-loss experiments, solver.py:723-785,
    which 9 of its 16 notebooks run on).

    Structure (cf. :func:`make_fused_train_rollout`, whose replay
    derivation this extends): with ``detach_forward`` and the
    NON-recursive losses (y_in_h = V(X_n), i.e. 'diffusion' / terminal
    'BSDE' — solver.py:765-770), the accumulated value decomposes into
    per-step increments

        a_n = [(-h(X_n, V_n, Z_n) + <Z_n, c_n>) dt + <Z_n, xi_n> sq_dt]
              * adv_n

    whose parameter dependence enters only through (V_n, Z_n) =
    (V, sigma^T grad V)(X_n) at that step — the stopped/advance masks
    adv_n are parameter-free because the X chain is detached (with
    ``adaptive_forward`` the chain depends on parameter VALUES through
    the stop-gradient control, which the replay reproduces exactly).
    Every a_n shares one per-path cotangent dL/dY_k, so the backward
    needs no reverse sweep: it REPLAYS the forward (identical in-kernel
    per-tile PRNG stream — masks, states and noise regenerate bitwise)
    while accumulating sum_k gY_k da_{n,k}/dtheta via a traced per-step
    VJP.  Since Z itself is a vjp of the value net, that per-step VJP is
    grad-of-grad — a deeper but still static jaxpr, which Mosaic lowers
    like any other (this replaces the reference's per-step
    ``autograd.grad(..., create_graph=True)``, solver.py:725-729).

    Unlike the HJB kernel, the start state is an argument: ``run(leaves,
    X0T (d, K), t0 (K,), seed_f32) -> FusedStoppedOut``, differentiable
    in ``leaves`` (X0/t0 are sampled data and receive no cotangent; the
    solver adds the differentiable Y_0 = V(X_0) and terminal V(X_tau)
    terms outside on (K,)-sized batches).  Masking algebra is
    step-for-step :func:`rollout.sde.stopped_rollout` (equivalence
    tested on host noise, incl. masks and gradients).
    """
    d = problem.d
    sig = problem.sigma_struct
    dt = np.float32(delta_t)
    sq_dt = np.float32(np.sqrt(delta_t))
    _normals = {"erfinv": _normals_from_bits_erfinv,
                "boxmuller": _normals_from_bits,
                "binom": _normals_from_bits_binom}[rng]
    T_horizon = np.float32(problem.T) if time_stopping else None
    example_leaves = tuple(
        jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))
        for x in example_leaves)
    n_leaves = len(example_leaves)
    use_host_noise = host_noise is not None

    # -- VMEM guardrail (cf. make_fused_train_rollout; the grad-of-grad
    # backward roughly doubles the live activation set, hence the larger
    # multiplier and the smaller calibration product)
    weight_bytes = sum(int(np.prod(x.shape)) * 4 for x in example_leaves)
    hidden_rows = sum(int(x.shape[-1]) for x in example_leaves
                      if getattr(x, "ndim", 0) >= 2)

    def vmem_estimate(t):
        bufs = 4 * t * (12 * d + 8 * hidden_rows + 96)
        noise = 4 * N * d * t if use_host_noise else 0
        return 2 * weight_bytes + bufs + noise

    if unroll is None:
        unroll = 1
    if unroll < 1 or N % unroll:
        raise ValueError(f"unroll={unroll} must divide N={N}")
    max_tile = max(
        128, (_STOPPED_CAL // max(1, d * ((unroll + 1) // 2))) // 128 * 128)
    tile_requested = tile is not None
    if tile is None:
        tile = 4096
    if tile > max_tile:
        if tile_requested:
            import warnings
            warnings.warn(
                "fused_stopped_train_rollout: requested tile=%d exceeds "
                "the d*tile*unroll scoped-VMEM calibration at d=%d, "
                "unroll=%d; capped to %d" % (tile, d, unroll, max_tile))
        tile = max_tile
    while tile > 128 and vmem_estimate(tile) > 96 * 2**20:
        tile = max(128, (tile // 2) // 128 * 128)
    if vmem_estimate(tile) > 96 * 2**20:
        raise ValueError(
            "fused_stopped_train_rollout: VMEM estimate %.1f MiB exceeds "
            "budget even at tile=128 (net too large) - use the scan path."
            % (vmem_estimate(tile) / 2**20))
    n_tiles = pl.cdiv(K, tile)
    Kp = n_tiles * tile

    # ---- step math (traced, then closure-converted into the kernels) ----
    def step_math(XT, t_row, stopped_f, xi, *params):
        T_ = XT.shape[1]
        V, ZT, hv = terms_math(tuple(params), XT, t_row)
        active = 1.0 - stopped_f                       # (1, T)
        if adaptive_forward:
            c = -lax.stop_gradient(ZT)
        else:
            c = None
        # the X chain is detached by construction (detach_forward): its
        # increments carry no parameter cotangent, so the masks below are
        # parameter-free and regenerate exactly in the backward replay
        drift = lax.stop_gradient(
            (problem.b_T(XT) + (sig.apply_cols(c) if c is not None
                                else 0.0)) * dt
            + sig.apply_cols(xi) * sq_dt)
        XT_prop = XT + drift * active
        # reference quirk preserved (solver.py:750-760 via sampling.py):
        # sphere geometries test the CURRENT state, squares the proposal
        new_sel = inside_fn_T(XT, XT_prop).reshape(1, T_)
        if time_stopping:
            new_sel = new_sel & ((t_row + dt) <= T_horizon)
        new_self = new_sel.astype(jnp.float32)
        adv = new_self * active                        # (1, T)
        if c is not None:
            dY = ((-hv + jnp.sum(ZT * c, axis=0, keepdims=True)) * dt
                  + jnp.sum(ZT * xi, axis=0, keepdims=True) * sq_dt)
        else:
            dY = (-hv * dt
                  + jnp.sum(ZT * xi, axis=0, keepdims=True) * sq_dt)
        a = dY * adv
        XT_new = XT + drift * adv   # == where(adv, X_prop, X): adv <= active
        stopped_new = 1.0 - (1.0 - stopped_f) * new_self
        t_new = t_row + dt * adv if time_stopping else t_row
        vl2 = jnp.zeros_like(a)
        if v_ref_T is not None:
            e = lax.stop_gradient(V) - v_ref_T(XT).reshape(1, T_)
            vl2 = e * e * active * dt
        return XT_new, t_new, stopped_new, a, vl2, active, adv

    def bwd_math(XT, t_row, stopped_f, xi, gy, *params):
        def of_params(*ps):
            XT_new, t_new, stopped_new, a, _, _, _ = step_math(
                XT, t_row, stopped_f, xi, *ps)
            return XT_new, t_new, stopped_new, a
        (XT_new, t_new, stopped_new, _), pull = jax.vjp(of_params, *params)
        grads = pull((jnp.zeros_like(XT), jnp.zeros_like(t_row),
                      jnp.zeros_like(stopped_f), gy))
        return (XT_new, t_new, stopped_new) + tuple(grads)

    X_ex = jax.ShapeDtypeStruct((d, tile), jnp.float32)
    r_ex = jax.ShapeDtypeStruct((1, tile), jnp.float32)

    fwd_open, fwd_consts = _closure_convert(
        step_math, X_ex, r_ex, r_ex, X_ex, *example_leaves)
    bwd_open, bwd_consts = _closure_convert(
        bwd_math, X_ex, r_ex, r_ex, X_ex, r_ex, *example_leaves)

    hn = None
    if use_host_noise:
        hn = jnp.pad(jnp.asarray(host_noise, jnp.float32),
                     ((0, 0), (0, 0), (0, Kp - K)))

    def full_spec(x):
        nd = len(x.shape)
        return pl.BlockSpec(x.shape, lambda i, *_: (0,) * nd,
                            memory_space=pltpu.VMEM)
    x0_spec = pl.BlockSpec((d, tile), lambda i, *_: (0, i),
                           memory_space=pltpu.VMEM)
    noise_spec = pl.BlockSpec((N, d, tile), lambda i, *_: (0, 0, i),
                              memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",))

    def _pad_rows(v):   # (K,) -> (n_tiles, tile) full-array row table
        return jnp.pad(v.astype(jnp.float32), (0, Kp - K)).reshape(
            n_tiles, tile)

    # ------------------------------------------------------------- forward
    def _fwd(leaves, X0T, t0, seed):
        consts2d, cshapes = _canon2d(list(leaves) + list(fwd_consts))
        X0Tp = jnp.pad(X0T.astype(jnp.float32), ((0, 0), (0, Kp - K)))
        inputs = consts2d + [X0Tp, _pad_rows(t0)]
        if use_host_noise:
            inputs.append(hn)
        n_in = len(inputs)

        def kernel(seed_ref, *refs):
            in_refs = refs[:n_in]
            xt_out, acc_out = refs[n_in], refs[n_in + 1]
            noise_ref = in_refs[-1] if use_host_noise else None
            base = in_refs[:len(cshapes)]
            x0_ref = in_refs[len(cshapes)]
            t0_ref = in_refs[len(cshapes) + 1]
            if not use_host_noise:
                pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            extra = tuple(r[:].reshape(cshapes[j])
                          for j, r in enumerate(base))
            X0 = x0_ref[:]
            # full-array ref + ds row slice (a (1, tile) block of an
            # (n_tiles, tile) array violates the (8, 128) sublane tiling)
            t0_row = t0_ref[pl.ds(pl.program_id(0), 1), :]
            # zero accumulators derived from the row LOAD, not a constant:
            # a literal jnp.zeros carry gets Mosaic's fully-replicated
            # {*,*} layout, and the loop body's keepdims-reduce results
            # ({*,0}) cannot be relayouted back to it ("Invalid relayout"
            # on real hardware; interpret mode does not catch this)
            z = t0_row * jnp.float32(0.0)

            def body(n0, carry):
                X, t_row, stp, aY, aV, aH, aA = carry
                for j in range(unroll):
                    n = n0 * unroll + j
                    xi = (noise_ref[n] if use_host_noise
                          else _normals((d, tile)))
                    pvals = extra[:n_leaves]
                    cvals = extra[n_leaves:]
                    X, t_row, stp, a, vl2, act, adv = fwd_open(
                        *cvals, X, t_row, stp, xi, *pvals)
                    aY, aV = aY + a, aV + vl2
                    aH, aA = aH + act, aA + adv
                return X, t_row, stp, aY, aV, aH, aA

            X, t_row, stp, aY, aV, aH, aA = lax.fori_loop(
                0, N // unroll, body, (X0, t0_row, z, z, z, z, z))
            xt_out[:] = X
            acc_out[0:1, :] = aY
            acc_out[1:2, :] = t_row
            acc_out[2:3, :] = stp
            acc_out[3:4, :] = aH
            acc_out[4:5, :] = aV
            acc_out[5:6, :] = aA
            acc_out[6:, :] = jnp.zeros((2, tile), jnp.float32)

        in_specs = [full_spec(x) for x in inputs[:n_in]]
        in_specs[len(cshapes)] = x0_spec
        if use_host_noise:
            in_specs[-1] = noise_spec
        out = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=in_specs,
                out_specs=(
                    pl.BlockSpec((d, tile), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, tile), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM)),
            ),
            out_shape=(jax.ShapeDtypeStruct((d, Kp), jnp.float32),
                       jax.ShapeDtypeStruct((8, Kp), jnp.float32)),
            interpret=interpret,
            compiler_params=compiler_params,
        )(jnp.asarray([seed], jnp.int32), *inputs)
        XT, acc = out
        return FusedStoppedOut(XT[:, :K], acc[0, :K], acc[1, :K],
                               acc[2, :K], acc[3, :K], acc[4, :K],
                               acc[5, :K])

    # ------------------------------------------------------------ backward
    def _bwd(leaves, X0T, t0, seed, gY):
        consts2d, cshapes = _canon2d(list(leaves) + list(bwd_consts))
        X0Tp = jnp.pad(X0T.astype(jnp.float32), ((0, 0), (0, Kp - K)))
        inputs = consts2d + [X0Tp, _pad_rows(t0), _pad_rows(gY)]
        if use_host_noise:
            inputs.append(hn)
        n_in = len(inputs)
        # grad accumulators use the same canonical 2-d layout _canon2d
        # gives the inputs: 2-d as-is, 0-d -> (1, 1), else (1, size)
        # (code review r5: (1, x.shape[0]) raised IndexError on 0-d
        # leaves and mis-sized rank>=3 leaves vs _canon2d's flattening)
        leaf_shapes = [tuple(x.shape) if x.ndim == 2
                       else (1, 1) if x.ndim == 0
                       else (1, int(np.prod(x.shape)))
                       for x in leaves]

        def kernel(seed_ref, *refs):
            in_refs = refs[:n_in]
            grad_refs = refs[n_in:]
            noise_ref = in_refs[-1] if use_host_noise else None
            base = in_refs[:len(cshapes)]
            x0_ref = in_refs[len(cshapes)]
            t0_ref = in_refs[len(cshapes) + 1]
            gy_ref = in_refs[len(cshapes) + 2]
            if not use_host_noise:
                pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
            extra = tuple(r[:].reshape(cshapes[j])
                          for j, r in enumerate(base))
            X0 = x0_ref[:]
            t0_row = t0_ref[pl.ds(pl.program_id(0), 1), :]
            gy = gy_ref[pl.ds(pl.program_id(0), 1), :]
            # load-derived zero (see the forward kernel's layout note)
            z = t0_row * jnp.float32(0.0)
            g0 = tuple(jnp.zeros(s, jnp.float32) for s in leaf_shapes)

            def body(n0, carry):
                X, t_row, stp = carry[:3]
                gacc = carry[3:]
                for j in range(unroll):
                    n = n0 * unroll + j
                    xi = (noise_ref[n] if use_host_noise
                          else _normals((d, tile)))
                    pvals = extra[:n_leaves]
                    cvals = extra[n_leaves:]
                    outs = bwd_open(*cvals, X, t_row, stp, xi, gy,
                                    *pvals)
                    X, t_row, stp = outs[0], outs[1], outs[2]
                    gacc = tuple(
                        ga + gn.reshape(s)
                        for ga, gn, s in zip(gacc, outs[3:], leaf_shapes))
                return (X, t_row, stp) + gacc

            out = lax.fori_loop(0, N // unroll, body, (X0, t0_row, z) + g0)
            for j, gref in enumerate(grad_refs):
                gref[:] = out[3 + j][None]

        in_specs = [full_spec(x) for x in inputs[:n_in]]
        in_specs[len(cshapes)] = x0_spec
        if use_host_noise:
            in_specs[-1] = noise_spec
        out_specs = tuple(
            pl.BlockSpec((1,) + s, lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM) for s in leaf_shapes)
        out_shape = tuple(
            jax.ShapeDtypeStruct((n_tiles,) + s, jnp.float32)
            for s in leaf_shapes)
        per_tile = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1, grid=(n_tiles,),
                in_specs=in_specs, out_specs=out_specs),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=compiler_params,
        )(jnp.asarray([seed], jnp.int32), *inputs)
        return tuple(
            g.sum(axis=0).reshape(l.shape)
            for g, l in zip(per_tile, leaves))

    # ------------------------------------------------- custom-VJP wrapper
    @jax.custom_vjp
    def run(leaves, X0T, t0, seed_f32):
        return _fwd(leaves, X0T, t0, seed_f32.astype(jnp.int32))

    def run_fwd(leaves, X0T, t0, seed_f32):
        seed = seed_f32.astype(jnp.int32)
        return _fwd(leaves, X0T, t0, seed), (leaves, X0T, t0, seed)

    def run_bwd(res, ct):
        leaves, X0T, t0, seed = res
        # only Y carries a parameter cotangent (X chain and masks are
        # parameter-free by the detached-forward construction; X0/t0 are
        # sampled data)
        grads = _bwd(leaves, X0T, t0, seed, ct.Y)
        return (grads, jnp.zeros_like(X0T), jnp.zeros_like(t0),
                jnp.zeros((), jnp.float32))

    run.defvjp(run_fwd, run_bwd)
    run.tile = tile
    run.unroll = unroll
    return run


def make_fused_stopped_train_rollout_sharded(
    problem, terms_math, example_leaves, K, N, delta_t, *,
    mesh, axis="dp", **kw,
):
    """dp-sharded wrapper of :func:`make_fused_stopped_train_rollout`
    (cf. :func:`make_fused_train_rollout_sharded`: GSPMD cannot partition
    a ``pallas_call``, so each device runs the kernel on its path shard
    with replicated weights; the replicated-leaves transpose psums the
    per-shard parameter gradients).  ``X0T``/``t0`` are consumed as
    path-sharded inputs; per-shard PRNG streams are spaced by the
    kernel's maximum per-shard tile count."""
    if not any(ax == axis for ax in mesh.axis_names):
        raise ValueError(f"mesh has no '{axis}' axis: {mesh.axis_names}")
    n_dp = mesh.shape[axis]
    if K % n_dp:
        raise ValueError(f"K={K} not divisible by mesh '{axis}'={n_dp}")
    from jax.sharding import PartitionSpec as P

    inner = make_fused_stopped_train_rollout(
        problem, terms_math, example_leaves, K // n_dp, N, delta_t, **kw)

    tiles_max = max(1, (K // n_dp) // 128)

    def shard_fn(leaves, X0T, t0, seed_f):
        idx = lax.axis_index(axis).astype(jnp.float32)
        return inner(leaves, X0T, t0, seed_f + idx * np.float32(tiles_max))

    out = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P()),
        out_specs=FusedStoppedOut(P(None, axis), P(axis), P(axis), P(axis),
                                  P(axis), P(axis), P(axis)),
        check_vma=False)
    try:
        out.tile, out.unroll = inner.tile, inner.unroll
    except AttributeError:
        pass
    return out


def reference_controlled_rollout(problem, u_apply, param_leaves, K, N,
                                 delta_t, key, with_f=True,
                                 host_noise=None):
    """jnp lax.scan fallback with identical semantics (different RNG)."""
    d = problem.d
    sig = problem.sigma_struct
    dt = jnp.float32(delta_t)
    sq_dt = jnp.sqrt(dt)
    X0 = jnp.broadcast_to(problem.X_0, (K, d)).astype(jnp.float32)

    def f_eval(x, t):
        if not with_f:
            return jnp.zeros((x.shape[0],), dtype=jnp.float32)
        f = getattr(problem, "f", None)
        if f is None:
            return jnp.zeros((x.shape[0],), dtype=jnp.float32)
        try:
            return f(x, t)
        except TypeError:
            return f(x)

    def step(carry, n):
        X, ito, riem, fint = carry
        t = n.astype(jnp.float32) * dt
        if host_noise is not None:
            xi = jnp.asarray(host_noise, dtype=jnp.float32)[n]
        else:
            xi = jax.random.normal(jax.random.fold_in(key, n), (K, d))
        tX = jnp.concatenate(
            [jnp.full((K, 1), 0.0, jnp.float32) + t, X], axis=1)
        u = u_apply(tuple(param_leaves), tX)
        X = X + (problem.b(X) + sig.apply(u)) * dt + sig.apply(xi) * sq_dt
        ito = ito + jnp.sum(u * xi, axis=-1) * sq_dt
        riem = riem + jnp.sum(u * u, axis=-1) * dt
        fint = fint + f_eval(X, t) * dt
        return (X, ito, riem, fint), None

    zeros = jnp.zeros((K,), dtype=jnp.float32)
    (X, ito, riem, fint), _ = lax.scan(
        step, (X0, zeros, zeros, zeros), jnp.arange(N))
    return ISRolloutOut(X, ito, riem, fint)
