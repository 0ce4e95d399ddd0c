"""Single-pass loss-estimator statistics.

Rebuilds the "Compare relative errors of losses" study (notebook cell 2):
roll out the forward process once (no gradients), then compare the
statistical relative errors of the cross-entropy-type estimators
(which blow up ~ c^d in dimension) against the log-variance estimator
(dimension-independent ~ c); cf. BASELINE.md last row.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..rollout.sde import HJBRolloutConfig, hjb_rollout


def loss_estimator_statistics(problem, control_fn: Callable, params,
                              K: int, delta_t: float, key,
                              outlier_cutoff: float = 100.0,
                              adaptive: bool = False,
                              detach: bool = False) -> Dict[str, float]:
    """Returns mean/variance pairs for: the plain weight exp(-g), the
    naive cross-entropy estimator Y exp(-g), the detached-reweighting
    variant Y exp(-g + Y), its outlier-filtered version, and the
    log-variance loss-value estimator (with its 4th-moment variance).

    Note: the notebook accumulates Y with +h (not -h) — it studies the
    estimator statistics of the integrand, not the trained solver; we
    reproduce that by negating h through a problem shim.
    """
    N = int(np.floor(problem.T / delta_t))

    class _NegH:
        T = problem.T
        sigma_struct = problem.sigma_struct
        b = staticmethod(problem.b)
        f = staticmethod(problem.f)
        g = staticmethod(problem.g)

        @staticmethod
        def h(t, x, y, z):
            return -problem.h(t, x, y, z)

    cfg = HJBRolloutConfig(N=N, delta_t=delta_t, adaptive_forward=adaptive,
                           detach_forward=detach, track_u_l2=False)

    @jax.jit
    def run(key):
        X0 = jnp.broadcast_to(problem.X_0, (K, problem.d))
        out = hjb_rollout(cfg, _NegH(), control_fn, params, X0,
                          jnp.zeros((K,)), key)
        Y, gX = out.Y, problem.g(out.X)
        w = jnp.exp(-gX)
        ce = Y * w
        ced = Y * jnp.exp(-gX + Y)
        mask = jnp.abs(ced) < outlier_cutoff
        n_sel = jnp.maximum(jnp.sum(mask), 1.0)
        mean_sel = jnp.sum(jnp.where(mask, ced, 0.0)) / n_sel
        var_sel = jnp.sum(jnp.where(mask, (ced - mean_sel) ** 2, 0.0)) / n_sel
        r = Y - gX
        rc = r - jnp.mean(r)
        return {
            "mean_g": jnp.mean(w), "var_g": _uvar(w),
            "mean_CE": jnp.mean(ce), "var_CE": _uvar(ce),
            "mean_CE_detach": jnp.mean(ced), "var_CE_detach": _uvar(ced),
            "mean_CE_detach_selection": jnp.abs(mean_sel),
            "std_CE_detach_selection": jnp.sqrt(var_sel),
            "mean_var": _uvar(r),
            "var_var": jnp.mean(rc ** 4) - _uvar(r) ** 2,
        }

    return {k: float(v) for k, v in jax.device_get(run(key)).items()}


def _uvar(x):
    n = x.shape[0]
    return jnp.var(x) * n / max(n - 1, 1)


def relative_error(stats: Dict[str, float], which: str) -> float:
    return float(np.sqrt(stats[f"var_{which}"])
                 / abs(stats[f"mean_{which}"]))
