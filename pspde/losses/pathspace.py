"""Path-space loss zoo for the HJB/parabolic solver.

Pure functions of the rollout outputs, mirroring ``Solver.loss_function``
(solver.py:164-192).  All reductions are ``jnp.mean`` over the path axis:
under pjit/GSPMD with the ensemble sharded across chips these lower to
``all-reduce`` collectives automatically, which is exactly the semantics
the log-variance / cross-entropy losses need (the *global* batch mean must
be taken before squaring — SURVEY.md section 5.8).

Variance conventions match the reference: ``log-variance`` uses the biased
mean-of-squares minus squared-mean form (solver.py:168) while ``variance``
uses torch's Bessel-corrected ``pt.var`` (solver.py:172).

Not rebuilt: 'log-variance_red' / 'log-variance_red_2' (solver.py:173-178)
— dead code in the reference; they read module-level ``u_int`` /
``u_W_int`` / ``double_int`` that only exist as locals inside ``train``,
so they raise NameError if ever selected.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

HJB_LOSS_METHODS = (
    "moment", "log-variance", "log-variance-repa", "variance",
    "relative_entropy", "relative_entropy_BSDE", "cross_entropy",
    "relative_entropy_log-variance", "reparametrization", "log-variance-y_0",
)


def _unbiased_var(x):
    n = x.shape[0]
    return jnp.var(x) * n / max(n - 1, 1)


def log_variance_loss(Y, gX):
    """E[(Y - g)^2] - E[Y - g]^2 — solver.py:168."""
    r = Y - gX
    return jnp.mean(r ** 2) - jnp.mean(r) ** 2


def moment_loss(Y, gX):
    """E[(Y - g)^2] — solver.py:166."""
    return jnp.mean((Y - gX) ** 2)


def variance_loss(Y, gX):
    """Var[exp(-g + Y)] (unbiased, torch convention) — solver.py:172."""
    return _unbiased_var(jnp.exp(-gX + Y))


def relative_entropy_loss(Z_sum, gX):
    """E[Z_sum + g] — solver.py:180."""
    return jnp.mean(Z_sum + gX)


def cross_entropy_loss(Y, gX, adaptive: bool):
    """E[Y exp(-g + sg(Y))] (adaptive) or E[Y exp(-g)] — solver.py:183-186."""
    if adaptive:
        return jnp.mean(Y * jnp.exp(-gX + lax.stop_gradient(Y)))
    return jnp.mean(Y * jnp.exp(-gX))


def hjb_loss(method: str, Y, gX, Z_sum, *, adaptive: bool = True,
             phase: int = 0):
    """Dispatch; ``phase`` is the static iteration tag used by the
    alternating/scheduled losses (repa parity l % 2, solver.py:170;
    relative_entropy -> log-variance switch at l = 1000, solver.py:187-190,
    where phase encodes l < 1000)."""
    if method == "moment":
        return moment_loss(Y, gX)
    if method == "log-variance":
        return log_variance_loss(Y, gX)
    if method == "log-variance-repa":
        sign = jnp.float32(phase * 2 - 1)
        return sign * log_variance_loss(Y, gX)
    if method == "variance":
        return variance_loss(Y, gX)
    if method in ("relative_entropy", "relative_entropy_BSDE",
                  "reparametrization"):
        return relative_entropy_loss(Z_sum, gX)
    if method == "cross_entropy":
        return cross_entropy_loss(Y, gX, adaptive)
    if method == "relative_entropy_log-variance":
        if phase == 0:   # l < 1000
            return relative_entropy_loss(Z_sum, gX)
        return log_variance_loss(Y, gX)
    raise ValueError(f"unknown loss method: {method}")


def log_variance_y0_losses(Y, gX):
    """The 'log-variance-y_0' split (solver.py:205-218): the (unbiased)
    variance part updates the control net, the squared-mean part updates
    y_0.  Returns (var_part, mean_sq_part)."""
    r = Y - gX
    return _unbiased_var(r), jnp.mean(r) ** 2
