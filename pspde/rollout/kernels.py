"""Pallas TPU kernels for the SDE rollout hot paths.

``fused_controlled_rollout`` runs the ENTIRE N-step controlled
Euler-Maruyama simulation inside one Pallas kernel: the (K_tile, d) path
state, the control-network weights and the Ito/Riemann accumulators stay
resident in VMEM for all N steps, so the loop performs zero HBM traffic
(the XLA scan implementation round-trips the carry through HBM every
step).  Noise is generated in-kernel with the TPU PRNG
(pltpu.prng_random_bits) and a Box-Muller transform.

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
):
    """Simulate dX_u = (b(X_u) + sigma u) dt + sigma dW with
    u = u_apply(params, [t, X_u]) and accumulate the Girsanov integrals.

    sigma must be STATE-INDEPENDENT (``problem.sigma_struct`` applied as a
    constant matrix/diagonal).  The kernel keeps the weights and one path
    tile resident in VMEM; the tile is auto-shrunk when the estimated
    footprint exceeds ``vmem_budget_bytes`` and a ValueError (with the
    estimate) is raised when the weights alone cannot fit."""
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
    cj = jax.make_jaxpr(step_math)(X_ex, t_ex, X_ex, *param_leaves)
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

        def body(n, carry):
            X, acc = carry
            t = n.astype(jnp.float32) * dt
            if use_host_noise:
                xi = noise_ref[n]
            else:
                xi = _normals_from_bits((tile, d))
            if collect_path:
                # pre-step state: X_path[n] = X_n (the state the control
                # was evaluated at)
                path_ref[pl.ds(n, 1)] = X[None]
            X_new, u, fv = step_closed(X, t, xi, *extra)
            d_acc = jnp.stack(
                [jnp.sum(u * xi, axis=-1) * sq_dt,
                 jnp.sum(u * u, axis=-1) * dt,
                 fv * dt], axis=-1)
            return X_new, acc + d_acc

        X, acc = lax.fori_loop(0, N, body, (X0, acc0))
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
