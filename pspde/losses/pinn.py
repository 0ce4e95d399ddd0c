"""PINN residual losses (elliptic: solver.py:828-931; parabolic:
solver.py:1208-1323).

The second-order term is computed with a vmapped forward-over-reverse
Hessian (jax.hessian) and contracted per the diffusion structure:
  * diagonal sigma ("not full_hessian", solver.py:896-899):
      B_00^2 * Tr(H)
  * full sigma (solver.py:891-894):  Tr(B B^T H)
This replaces the reference's O(K) Python loop of per-sample
``autograd.functional.hessian`` calls — the single slowest code path in
the reference (SURVEY.md 3.2) — with one batched XLA computation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elliptic_pinn_residual(problem, v_fn, X, full_hessian: bool):
    """Residual of the generator: 1/2 tr(sigma sigma^T H) + b . grad V
    + h(x, V, B grad V)  (solver.py:901-906)."""
    v_scalar = lambda x: v_fn(x[None, :])[0]
    grad = jax.vmap(jax.grad(v_scalar))(X)
    H = jax.vmap(jax.hessian(v_scalar))(X)
    B = problem.sigma_struct.mat
    if full_hessian:
        second = jax.vmap(lambda h: jnp.trace(B @ B.T @ h))(H)
    else:
        second = B[0, 0] ** 2 * jax.vmap(jnp.trace)(H)
    V = v_fn(X)
    Z = problem.sigma_struct.apply(grad)
    return 0.5 * second + jnp.sum(problem.b(X) * grad, axis=-1) \
        + problem.h(X, V, Z)


def parabolic_pinn_residual(problem, v_fn_xt, X, t, full_hessian: bool):
    """Parabolic residual: dV/dt + 1/2 tr(sigma sigma^T H_x) + b . grad_x V
    + h(t, x, V, B grad_x V)  (solver.py:1284-1285)."""
    d = X.shape[-1]

    def v_scalar(xt):
        return v_fn_xt(xt[None, :])[0]

    XT = jnp.concatenate([X, t[:, None]], axis=-1)
    grad = jax.vmap(jax.grad(v_scalar))(XT)
    grad_x, dVdt = grad[:, :d], grad[:, d]
    H = jax.vmap(jax.hessian(v_scalar))(XT)
    Hx = H[:, :d, :d]
    B = problem.sigma_struct.mat
    if full_hessian:
        second = jax.vmap(lambda h: jnp.trace(B @ B.T @ h))(Hx)
    else:
        second = B[0, 0] ** 2 * jax.vmap(jnp.trace)(Hx)
    V = v_fn_xt(XT)
    Z = problem.sigma_struct.apply(grad_x)
    return (dVdt + 0.5 * second + jnp.sum(problem.b(X) * grad_x, axis=-1)
            + problem.h(t, X, V, Z))
