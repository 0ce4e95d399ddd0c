"""A-posteriori Monte-Carlo refinement of pointwise values (Feynman-Kac).

For the GeneralSolver PDE family  dv/dt + L v + h(t, x, v, sigma^T grad v)
= 0, v(T, .) = f_terminal  (solver.py:1062-1183's loss conventions: the Y
recursion accumulates -h, so v(t0, x0) = E[f(X_T) + int_t0^T h ds] along
the UNCONTROLLED dynamics dX = b dt + sigma dW), re-estimate v(t0, x0) by
plain Monte Carlo with the LEARNED approximation plugged into h only.

Why this beats reading the net: the learned V enters the estimate solely
through the h integral, so the refined value's systematic error contracts
by a factor ~ (T - t0) * sup|dh/dy| (one Picard iteration around the
learned solution; for Allen-Cahn h = y - y^3 on [0, 0.3] that is ~0.3x),
while the MC error shrinks as K^{-1/2} with K ~ 10^6 paths costing
seconds at the measured rollout throughput.  The terminal term f(X_T) is
exact.  No counterpart exists in the reference (its only pointwise
readout is the raw net evaluation, Allen-Cahn.ipynb cell 13).

Restricted to unbounded geometries (no exit stopping): Heat/Allen-Cahn
style problems.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class RefinedValue(NamedTuple):
    value: jnp.ndarray    # () refined v(t0, x0)
    stderr: jnp.ndarray   # () Monte-Carlo standard error
    direct: jnp.ndarray   # () the raw net readout v_fn(x0, t0)
    # fraction of paths still inside the domain at N_cap (elliptic variant
    # only; such paths are force-projected onto the boundary, biasing the
    # estimate when E[tau] approaches N_cap * dt)
    cap_frac: float = 0.0


def feynman_kac_refine(
    problem,
    v_fn: Callable,            # (X (K, d), t (K,)) -> (K,) learned value
    x0: jnp.ndarray,           # (d,) evaluation point
    t0: float = 0.0,
    K: int = 1_000_000,
    delta_t: float = 1e-3,
    key: Optional[jax.Array] = None,
    with_z: bool = False,      # h needs z = sigma^T grad_x V
) -> RefinedValue:
    """One-shot Picard/Feynman-Kac refinement of v(t0, x0)."""
    geom = problem.geometry
    assert geom is None or not geom.bounded, \
        "feynman_kac_refine: bounded domains need exit stopping - unsupported"
    if key is None:
        key = jax.random.PRNGKey(0)
    d = problem.d
    T = problem.T
    N = int(np.ceil((T - t0) / delta_t))
    dt = jnp.float32((T - t0) / N)
    sq_dt = jnp.sqrt(dt)
    sig = problem.sigma_struct

    def h_eval(t, X):
        ts = jnp.full((K,), t, jnp.float32)
        if with_z:
            V, pull = jax.vjp(lambda x: v_fn(x, ts), X)
            (gX,) = pull(jnp.ones_like(V))
            Z = sig.apply_T(gX)
        else:
            V = v_fn(X, ts)
            Z = None
        return problem.h(t, X, V, Z)

    @jax.jit
    def run(key):
        X0 = jnp.broadcast_to(x0.astype(jnp.float32), (K, d))

        def step(carry, n):
            X, acc = carry
            t = jnp.float32(t0) + n.astype(jnp.float32) * dt
            acc = acc + h_eval(t, X) * dt
            xi = jax.random.normal(jax.random.fold_in(key, n), (K, d))
            X = X + problem.b(X) * dt + sig.apply(xi) * sq_dt
            return (X, acc), None

        (X, acc), _ = lax.scan(step, (X0, jnp.zeros((K,))), jnp.arange(N))
        per_path = problem.f_terminal(X) + acc
        mean = jnp.mean(per_path)
        stderr = jnp.std(per_path) / jnp.sqrt(jnp.float32(K))
        direct = jnp.mean(v_fn(X0[:1], jnp.full((1,), t0, jnp.float32)))
        return mean, stderr, direct

    mean, stderr, direct = run(key)
    return RefinedValue(mean, stderr, direct)


def bgk_closures(problem, delta_t):
    """(inside, project) closures for discretely-monitored first-exit MC
    with the Broadie-Glasserman-Kou continuity correction: the stopping
    test runs against the domain SHRUNK by 0.5826 * sigma * sqrt(dt) and
    exit states are radially projected onto the TRUE boundary.  Supports
    'sphere' and 'two_spheres' Dirichlet geometries (shared by
    :func:`feynman_kac_refine_elliptic` and eval/picard.py's elliptic
    stage)."""
    geom = problem.geometry
    assert geom is not None and geom.bounded, \
        "bgk_closures needs a bounded Dirichlet geometry"
    assert geom.kind in ("sphere", "two_spheres"), geom.kind
    sig_mat = np.asarray(problem.sigma_struct.mat)
    sig_radial = float(np.sqrt(np.max(np.diag(sig_mat @ sig_mat.T))))
    shift = 0.5826 * sig_radial * float(np.sqrt(delta_t))
    if geom.kind == "sphere":
        R_out, R_in = geom.boundary_distance, None
    else:
        R_out = geom.boundary_distance_2
        R_in = geom.boundary_distance_1

    def inside(X):
        r = jnp.sqrt(jnp.sum(X * X, axis=-1))
        ok = r < (R_out - shift)
        if R_in is not None:
            ok = ok & (r > (R_in + shift))
        return ok

    def project(X):
        r = jnp.sqrt(jnp.sum(X * X, axis=-1, keepdims=True))
        if R_in is None:
            tgt = jnp.float32(R_out)
        else:
            mid = 0.5 * (R_in + R_out)
            tgt = jnp.where(r > mid, R_out, R_in)
        return X * (tgt / jnp.maximum(r, 1e-12))

    return inside, project


def feynman_kac_refine_elliptic(
    problem,
    v_fn: Callable,            # (X (K, d)) -> (K,) learned value
    x0: jnp.ndarray,           # (d,) evaluation point (interior)
    K: int = 262_144,
    N_cap: int = 4096,
    delta_t: float = 1e-3,
    key: Optional[jax.Array] = None,
) -> RefinedValue:
    """Stopped-domain variant for Dirichlet elliptic problems:
    v(x0) = E[g(X_tau) + int_0^tau h(X_s, v(X_s), .) ds] with tau the
    first exit time (EllipticSolver family, solver.py:723-801
    conventions; Y accumulates -h so the fixed point carries +h here).

    Contraction caveat: the elliptic Picard map contracts only when
    sup|dh/dy| * E[tau] < 1 — true for the committor (h = 0) and other
    mildly nonlinear problems, NOT for stiff manufactured h like
    ExponentialOnBallNonlinear (dh/dy ~ -2 alpha (2 alpha r^2 + d),
    measured 1.8x amplification of a 5% model error at d=4).  With an
    accurate model the readout is an oracle regardless (exact-model
    error ~0.3% at dt=1e-3, test_refine).

    Discrete-monitoring exit bias is removed with the
    Broadie-Glasserman-Kou barrier shift: the stopping test runs against
    a domain SHRUNK by beta * sigma * sqrt(dt) (beta = 0.5826), h
    accumulates only strictly inside it, and g is evaluated at the
    radial projection of the exit state onto the TRUE boundary.  Without
    the shift the discrete walk systematically outlives the continuous
    exit time (measured: -12.7% on the d=4 nonlinear Dirichlet ball with
    the exact solution plugged in; -0.3% with it).  Note this is an
    ORACLE readout convention — the training losses keep the reference's
    frozen-state semantics (solver.py:750-779) for parity.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    d = problem.d
    dt = jnp.float32(delta_t)
    sq_dt = jnp.sqrt(dt)
    sig = problem.sigma_struct
    inside, project = bgk_closures(problem, delta_t)

    @jax.jit
    def run(key):
        X0 = jnp.broadcast_to(x0.astype(jnp.float32), (K, d))

        def step_simple(carry, n):
            X, acc, stopped = carry
            ins = inside(X)
            active = ~stopped & ins
            h = problem.h(X, v_fn(X), None)
            acc = acc + jnp.where(active, h, 0.0) * dt
            xi = jax.random.normal(jax.random.fold_in(key, n), (K, d))
            Xp = X + problem.b(X) * dt + sig.apply(xi) * sq_dt
            X = jnp.where(active[:, None], Xp, X)
            stopped = stopped | ~ins
            return (X, acc, stopped), None

        (X, acc, stopped), _ = lax.scan(
            step_simple, (X0, jnp.zeros((K,)), jnp.zeros((K,), bool)),
            jnp.arange(N_cap))
        per_path = problem.g(project(X)) + acc
        mean = jnp.mean(per_path)
        stderr = jnp.std(per_path) / jnp.sqrt(jnp.float32(K))
        direct = jnp.mean(v_fn(X0[:1]))
        cap_frac = jnp.mean((~stopped & inside(X)).astype(jnp.float32))
        return mean, stderr, direct, cap_frac

    mean, stderr, direct, cap_frac = run(key)
    cap_frac = float(cap_frac)
    if cap_frac > 1e-3:
        import warnings
        warnings.warn(
            "feynman_kac_refine_elliptic: %.2f%% of paths had not exited "
            "at N_cap=%d and were projected onto the boundary - the "
            "estimate is biased; raise N_cap" % (100 * cap_frac, N_cap),
            stacklevel=2)
    return RefinedValue(mean, stderr, direct, cap_frac)
