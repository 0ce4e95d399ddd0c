"""Double-well HJB training against the FD oracle + importance-sampling
diagnostics (the metastability workflow of the reference's
"Double well - 1d - high metastability" notebook, CPU-sized)."""

import jax
import jax.numpy as jnp
import numpy as np

from pspde.eval import do_importance_sampling, importance_sampling
from pspde.problems import LLGC, DoubleWell
from pspde.solvers import HJBSolver


def test_double_well_training_and_is():
    dw = DoubleWell(d=1, T=1.0, eta=1.0, kappa=1.0)
    dw.compute_reference_solution(delta_t=0.01, nx=500)
    s = HJBSolver("dw", dw, lr=5e-3, L=400, K=1024, delta_t=0.01,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, verbose=False,
                  metastability_logs=(jnp.ones(1), 0.5),
                  early_stopping_time=None)
    s.train()
    assert s.u_L2_loss[-1] < 0.3 * s.u_L2_loss[0]
    # learned control beats naive MC as an IS proposal
    out = do_importance_sampling(dw, s, K=20000, verbose=False,
                                 key=jax.random.PRNGKey(1))
    rel_naive, rel_is = out[2], out[5]
    assert rel_is < rel_naive
    assert len(s.particles_close_to_target) == len(s.loss_log)


def test_is_with_true_control_llgc():
    """With the exact optimal control the IS estimator variance collapses
    (zero-variance property of the HJB control)."""
    p = LLGC(d=2, T=1.0)
    s = HJBSolver("x", p, L=1, K=8, delta_t=0.05, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    mean_is, var_is, rel_is = importance_sampling(
        p, s, K=5000, control="true", key=jax.random.PRNGKey(2))
    mean_n, var_n, rel_n, *_ = importance_sampling(
        p, s, K=5000, control="true", simulate_naive=True,
        key=jax.random.PRNGKey(2))
    # true value: E[exp(-g(X_T))] = exp(-v(x0, 0))
    v0 = float(p.v_ref(jnp.zeros((1, 2)), 0.0)[0])
    np.testing.assert_allclose(mean_is, np.exp(-v0), rtol=0.02)
    assert rel_is < 0.15 * rel_n


def test_is_cross_statistics():
    dw = DoubleWell(d=1, T=0.5, eta=1.0, kappa=1.0)
    dw.compute_reference_solution(delta_t=0.01, nx=400)
    s = HJBSolver("dw", dw, lr=5e-3, L=1, K=64, delta_t=0.01,
                  time_approx="inner", verbose=False,
                  early_stopping_time=None)
    out = importance_sampling(dw, s, K=1000, simulate_naive=True,
                              cross_statistics=0.0, verbose=True,
                              key=jax.random.PRNGKey(3))
    assert len(out) == 6


def test_antithetic_variance_reduction():
    """antithetic=True: mirrored noise pairs cut the naive estimator's
    RE for the smooth lognormal payoff exp(-alpha^T X_T) (the reported
    statistics are of the pair-averaged estimator at the SAME total K,
    so the comparison is like-for-like)."""
    import pytest
    p = LLGC(d=2, T=1.0)
    s = HJBSolver("a", p, L=1, K=8, delta_t=0.05, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    kw = dict(simulate_naive=True, key=jax.random.PRNGKey(5))
    mn_p, _, rn_p, *_ = importance_sampling(p, s, K=20000, **kw)
    mn_a, _, rn_a, *_ = importance_sampling(p, s, K=20000,
                                            antithetic=True, **kw)
    np.testing.assert_allclose(mn_a, mn_p, rtol=0.05)
    assert rn_a < 0.85 * rn_p
    with pytest.raises(ValueError):
        importance_sampling(p, s, K=999, antithetic=True)


def test_qmc_importance_sampling():
    """qmc=True: scrambled-Sobol noise gives (1) a mean consistent with
    plain MC, and (2) a much smaller across-replicate spread of the mean
    estimate at the same K (smooth lognormal payoff; the QMC win is
    measured across 6 independent scrambles vs 6 PRNG keys)."""
    import pytest
    p = LLGC(d=2, T=0.5)
    s = HJBSolver("q", p, L=1, K=8, delta_t=0.05, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    kw = dict(simulate_naive=True, delta_t=0.05)
    means_mc, means_qmc = [], []
    for i in range(6):
        mn, *_ = importance_sampling(p, s, K=2048,
                                     key=jax.random.PRNGKey(100 + i), **kw)
        means_mc.append(mn)
        mq, *_ = importance_sampling(p, s, K=2048, qmc=True,
                                     key=jax.random.PRNGKey(200 + i), **kw)
        means_qmc.append(mq)
    mu = np.mean(means_mc)
    np.testing.assert_allclose(np.mean(means_qmc), mu, rtol=0.02)
    assert np.std(means_qmc) < 0.4 * np.std(means_mc), (
        np.std(means_qmc), np.std(means_mc))
    with pytest.raises(ValueError, match="mutually exclusive"):
        importance_sampling(p, s, K=2048, qmc=True, antithetic=True)
