"""Multi-stage Picard refinement of a learned parabolic value function.

Iterates the Feynman-Kac fixed point  v(t, x) = E[f(X_T) + int_t^T
h(s, X_s, v(s, X_s), .) ds]  (the GeneralSolver family's PDE,
solver.py:1062-1183 conventions) AROUND a trained model:

  stage:  targets_i = MC estimate of the right-hand side at anchor
          points (t_i, x_i) with the CURRENT model inside h;
          fit the model to the targets (supervised regression);

each stage contracts the model's systematic error by ~ (T - t) *
sup|dh/dy| (classical Picard iteration; ~0.3x per stage for Allen-Cahn
on [0, 0.3]), while the per-anchor MC noise (K_inner paths) is averaged
away by the regression over M anchors.  Two to three stages push a
~3%-accurate trained model to sub-1% pointwise accuracy at a cost of
seconds per stage on a v5e (M * K_inner * N path-steps, vectorized as
one flat ensemble with per-anchor time gating).

No counterpart exists in the reference; this composes its diffusion-loss
training output with the framework's rollout engine as an a-posteriori
corrector.  See also eval/refine.py (the single-point, single-stage
variant).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax


def _mc_targets(problem, v_fn, ts, Xs, K_inner, delta_t, key):
    """MC estimate of E[f(X_T) + int h ds] from each anchor (ts_i, Xs_i).

    All anchors are integrated as one flat (M*K_inner, d) ensemble for a
    fixed N_max = ceil(T/dt) steps; a per-row gate freezes rows whose
    remaining horizon T - t_i is exhausted (same masking algebra as the
    general solver's time stopping, rollout/sde.py: stopped_rollout)."""
    M, d = Xs.shape
    T = problem.T
    dt = jnp.float32(delta_t)
    sq_dt = jnp.sqrt(dt)
    sig = problem.sigma_struct
    N_max = int(np.ceil(T / delta_t))

    X0 = jnp.repeat(Xs, K_inner, axis=0)              # (M*K, d)
    t0 = jnp.repeat(ts, K_inner)                      # (M*K,)
    R = X0.shape[0]

    def step(carry, n):
        X, t, acc = carry
        active = (t + 0.5 * dt) < T
        h = problem.h(t, X, v_fn(X, t), None)
        acc = acc + jnp.where(active, h, 0.0) * dt
        xi = jax.random.normal(jax.random.fold_in(key, n), (R, d))
        drift = problem.b(X) * dt + sig.apply(xi) * sq_dt
        X = jnp.where(active[:, None], X + drift, X)
        t = jnp.where(active, t + dt, t)
        return (X, t, acc), None

    (X, t, acc), _ = lax.scan(
        step, (X0, t0, jnp.zeros((R,))), jnp.arange(N_max))
    vals = problem.f_terminal(X) + acc                # (M*K,)
    return jnp.mean(vals.reshape(M, K_inner), axis=1)


def picard_refine(
    problem,
    net,                       # Flax module: (x, t) input as [x, t] concat
    params,                    # trained params for `net`
    x0: jnp.ndarray,           # (d,) final evaluation point
    n_stages: int = 2,
    M: int = 4096,
    K_inner: int = 1024,
    delta_t: float = 1e-3,
    anchor_radius: Optional[float] = None,  # default: diffusion spread
    reg_steps: int = 3000,
    reg_lr: float = 1e-3,
    key: Optional[jax.Array] = None,
    readout_K: int = 1_000_000,
    verbose: bool = False,
):
    """Run `n_stages` Picard stages, then a high-K pointwise readout.

    Anchors are drawn from the diffusion tube of x0: t ~ U(0, T), x ~
    x0 + sqrt(tr(sigma sigma^T)/d * t) * z (z standard normal), matching
    the measure the final readout integrates over.  Returns
    (refined_value, stderr, params_final).
    """
    from .refine import feynman_kac_refine

    if key is None:
        key = jax.random.PRNGKey(0)
    d = problem.d
    T = problem.T
    sig_mat = np.asarray(problem.sigma_struct.mat)
    spread = float(np.sqrt(np.trace(sig_mat @ sig_mat.T) / d))

    def v_of(p):
        def v_fn(X, t):
            xt = jnp.concatenate([X, t[:, None]], axis=-1)
            return net.apply(p, xt)[:, 0]
        return v_fn

    @jax.jit
    def reg_fit(p, ts, Xs, targets):
        tx = jnp.concatenate([Xs, ts[:, None]], axis=-1)

        def loss(p):
            pred = net.apply(p, tx)[:, 0]
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
    for stage in range(n_stages):
        key, ka, kt, kr, ku = jax.random.split(key, 5)
        ts = jax.random.uniform(kt, (M,), minval=0.0, maxval=T)
        z = jax.random.normal(ka, (M, d))
        r = anchor_radius
        scale = (jnp.sqrt(ts)[:, None] * spread if r is None
                 else r * jax.random.uniform(ku, (M, 1)))
        Xs = x0[None, :] + scale * z
        targets = _mc_targets(problem, v_of(p), ts, Xs, K_inner,
                              delta_t, kr)
        p, reg_loss = reg_fit(p, ts, Xs, targets)
        if verbose:
            out = feynman_kac_refine(problem, v_of(p), x0, K=readout_K,
                                     delta_t=delta_t, key=key)
            print(f"  picard stage {stage}: reg_loss {float(reg_loss):.3e}"
                  f", refined v = {float(out.value):.6f}")

    out = feynman_kac_refine(problem, v_of(p), x0, K=readout_K,
                             delta_t=delta_t, key=key)
    return out.value, out.stderr, p
