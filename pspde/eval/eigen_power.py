"""Feynman-Kac semigroup power iteration for generator eigenproblems.

The FP eigenvalue problem (Eigenvalue - Fokker-Planck.ipynb cell 2;
pspde.problems.FokkerPlanckEigen + EigenSolver) solves A V = -lambda V
for A = L + W, where L is the diffusion generator and the potential W
enters through the linear-in-y running term h(x, y, .) = y * W(x)
(tests/test_problems.py: L v + h(x, v) = -lambda v on v_ref).  The
semigroup of A has the Feynman-Kac representation

    (e^{T A} f)(x) = E[ f(X_T) * exp(+int_0^T W(X_s) ds) ],
    dX = b dt + sigma dW,

and the eigenpair (V, -lambda) with POSITIVE eigenfunction is dominant
(Perron-Frobenius), so the power iteration

    V  <-  normalize( e^{T A} V )

contracts every other eigencomponent by e^{-(lambda_0 - lambda_1) T}
per stage.  Joint-training Adam equilibria plateau with an O(1e-4)
eigenfunction error and an O(1e-2) induced lambda bias (RESULTS.md
round-2/3 FP numbers); a few semigroup stages push V to the MC/
regression floor and the frozen-V lambda regression
(EigenSolver.estimate_lambda) then reads the eigenvalue at that floor.

Periodicity: the FP problem's coefficients are 2*pi-periodic, so paths
are WRAPPED into the fundamental box each step — exact for the
dynamics, and it keeps net evaluations inside the training domain.

No reference counterpart: the notebook's only readout is the last
training iterate of its SingleParam lambda.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


def fk_semigroup_targets(problem, v_fn, Xs, K_inner, T_horizon, delta_t,
                         key, W_of=None):
    """Per-anchor MC estimate of (e^{T A} V)(x_i).

    By default requires h linear in y (W(x) = problem.h(x, 1, None));
    ``W_of`` overrides the potential — e.g. the self-consistent-field
    linearization W_eff = h(x, V(x), .)/V(x) of a cubic nonlinearity
    (see eigen_power_refine's scf mode).  Geometry must be a 'square'
    periodic box (paths wrapped into [X_l, X_r]^d)."""
    M, d = Xs.shape
    geom = problem.geometry
    lo, hi = geom.X_l, geom.X_r
    width = hi - lo
    dt = jnp.float32(delta_t)
    sq_dt = jnp.sqrt(dt)
    sig = problem.sigma_struct
    N = int(np.round(T_horizon / delta_t))

    X0 = jnp.repeat(Xs, K_inner, axis=0)
    R = X0.shape[0]

    if W_of is None:
        def W_of(X):
            return problem.h(X, jnp.ones((X.shape[0],), X.dtype), None)

    def step(carry, n):
        X, logw = carry
        logw = logw + W_of(X) * dt
        xi = jax.random.normal(jax.random.fold_in(key, n), (R, d))
        X = X + problem.b(X) * dt + sig.apply(xi) * sq_dt
        X = lo + jnp.mod(X - lo, width)
        return (X, logw), None

    (X, logw), _ = lax.scan(step, (X0, jnp.zeros((R,))), jnp.arange(N))
    vals = v_fn(X) * jnp.exp(logw)
    return jnp.mean(vals.reshape(M, K_inner), axis=1)


def eigen_power_refine(
    problem,
    net,                       # Flax module V(x); params as net.init(...)
    params,
    n_stages: int = 3,
    T_horizon: float = 1.0,
    M: int = 4096,
    K_inner: int = 128,
    delta_t: float = 2e-3,
    reg_steps: int = 4000,
    reg_lr: float = 1e-3,
    K_center: int = 65536,
    key: Optional[jax.Array] = None,
    verbose: bool = False,
    mode: str = "linear",          # 'linear' | 'scf'
    normalization: str = "center",  # 'center' | 'l2'
):
    """Run ``n_stages`` Feynman-Kac power-iteration stages on a trained
    eigenfunction net.

    Each stage: anchors uniform in the periodic box, semigroup targets
    with the CURRENT net, normalization by pinning the center value to
    ``problem.v_ref(X_0)`` (the solver's 'center' normalization), then a
    supervised refit.  Per-stage the growth factor at the center gives a
    crude lambda estimate log(ratio)/T; the definitive readout is
    ``EigenSolver.estimate_lambda`` on the refined params.

    ``mode='scf'`` handles h nonlinear in y by the self-consistent-field
    linearization: each stage freezes the effective potential
    W_eff(x) = h(x, V(x), .) / V(x) at the CURRENT model (Gross-
    Pitaevskii-style ground-state iteration; requires V > 0, clipped
    at 1e-3).  ``normalization='l2'`` rescales so the box-uniform
    E[V^2] = 1 (the Schroedinger notebooks' constraint) instead of
    pinning the center value.

    Returns ``(params_final, history)``; history rows carry
    (lambda_growth, reg_loss)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    d = problem.d
    geom = problem.geometry
    lo, hi = geom.X_l, geom.X_r
    center = problem.X_0[None, :]
    v_center_true = (float(problem.v_ref(center)[0])
                     if normalization == "center" else None)

    def v_of(p):
        return lambda X: net.apply(p, X)[:, 0]

    def W_for(p):
        if mode == "linear":
            return None
        v_fn = v_of(p)

        def W_of(X):
            v = jnp.maximum(v_fn(X), 1e-3)
            return problem.h(X, v, None) / v

        return W_of

    targets_jit = jax.jit(lambda p, Xs, k, KI: fk_semigroup_targets(
        problem, v_of(p), Xs, KI, T_horizon, delta_t, k, W_of=W_for(p)),
        static_argnums=(3,))

    @jax.jit
    def reg_fit(p, Xs, targets):
        def loss(p):
            pred = net.apply(p, Xs)[:, 0]
            return jnp.mean((pred - targets) ** 2)

        tx_opt = optax.adam(reg_lr)
        state = tx_opt.init(p)

        def body(carry, _):
            p, state = carry
            l, g = jax.value_and_grad(loss)(p)
            up, state = tx_opt.update(g, state, p)
            return (optax.apply_updates(p, up), state), l

        (p, _), ls = lax.scan(body, (p, state), None, length=reg_steps)
        return p, ls[-1]

    p = params
    history = []
    for stage in range(n_stages):
        key, ka, kr, kc = jax.random.split(key, 4)
        Xs = lo + (hi - lo) * jax.random.uniform(ka, (M, d))
        targets = targets_jit(p, Xs, kr, K_inner)
        if normalization == "center":
            t_norm = targets_jit(p, center, kc, K_center)[0]
            v_norm_now = v_of(p)(center)[0]
            scale = v_center_true / t_norm
        else:
            # box-uniform L2 normalization E[V^2] = 1 from the anchors
            t_norm = jnp.sqrt(jnp.mean(targets ** 2))
            v_norm_now = jnp.sqrt(jnp.mean(v_of(p)(Xs) ** 2))
            scale = 1.0 / t_norm
        # growth under e^{TA}: e^{-lambda T} to leading order once V is
        # near the eigenfunction
        lam_growth = float(-jnp.log(t_norm / v_norm_now) / T_horizon)
        p, reg_loss = reg_fit(p, Xs, targets * scale)
        rec = {"lambda_growth": lam_growth,
               "reg_loss": float(reg_loss)}
        history.append(rec)
        if verbose:
            print(f"  power stage {stage}: lambda_growth "
                  f"{lam_growth:+.2e}, reg_loss {rec['reg_loss']:.3e}")
    return p, history
