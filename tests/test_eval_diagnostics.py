"""Diagnostics tests: gradient variance, estimator statistics, plotting,
experiment logs."""

import jax
import jax.numpy as jnp
import numpy as np

from pspde.ansatz import TanhMLP
from pspde.eval import (gradient_variances, load_exp_logs,
                        loss_estimator_statistics, relative_error,
                        save_exp_logs)
from pspde.problems import LLGC
from pspde.solvers import HJBSolver


def test_gradient_variances_shape_and_finite(key):
    p = LLGC(d=2, T=0.4)
    s = HJBSolver("g", p, L=1, K=64, delta_t=0.1, time_approx="outer",
                  loss_method="log-variance", verbose=False,
                  early_stopping_time=None)
    rel = gradient_variances(s, key)
    N = s.N
    assert rel.shape[0] == N
    assert np.isfinite(np.asarray(rel)).all()
    # moment-loss variant also runs
    rel_m = gradient_variances(s, key, loss_method="moment")
    assert rel_m.shape == rel.shape


def test_gradient_variance_hook_in_solver():
    p = LLGC(d=1, T=0.4)
    s = HJBSolver("g", p, L=6, K=64, delta_t=0.1, time_approx="outer",
                  loss_method="log-variance", verbose=False,
                  compute_gradient_variance=2, log_gradient=True,
                  early_stopping_time=None)
    s.train()
    assert len(s.grads_rel_error_log) == 3
    assert len(s.gradient_log) == 6
    assert all(np.isfinite(g).all() for g in s.gradient_log)


def test_estimator_statistics_dimension_scaling(key):
    """Cross-entropy relative error grows with d; log-variance stays flat
    (compare-losses notebook cells 2-3 / BASELINE.md last row)."""
    rel_ce, rel_lv = [], []
    for d in [1, 6]:
        p = LLGC(d=d, T=1.0, off_diag=0.1, h_sign=+1.0)
        net = TanhMLP(d_out=d)
        params = {"z": net.init(key, jnp.zeros((1, d + 1)))}

        def control_fn(prm, X, n, t):
            tX = jnp.concatenate(
                [jnp.full((X.shape[0], 1), 0.0) + t, X], axis=1)
            return net.apply(prm["z"], tX), None

        stats = loss_estimator_statistics(p, control_fn, params,
                                          K=200_000, delta_t=0.01, key=key)
        rel_ce.append(relative_error(stats, "CE_detach"))
        rel_lv.append(relative_error(stats, "var"))
    # CE rel err grows in d much faster than log-variance's
    assert rel_ce[1] / rel_ce[0] > 2.0 * (rel_lv[1] / max(rel_lv[0], 1e-9))


def test_plotting_and_exp_logs(tmp_path):
    p = LLGC(d=1, T=0.4)
    s = HJBSolver("m", p, L=4, K=32, delta_t=0.1, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    s.train()
    from pspde.eval import plot_loss_logs, plot_solution
    fig = plot_loss_logs("exp", [s])
    assert fig is not None
    fig2 = plot_solution(s, 0.5, 0.2, components=[0])
    assert fig2 is not None
    path = save_exp_logs([s], "exp", log_dir=str(tmp_path))
    logs = load_exp_logs(path.split("/")[-1], log_dir=str(tmp_path))
    assert "m" in logs and len(logs["m"]["loss"]) == 4


def test_make_is_runner_cached(key):
    """jit-once IS runner matches the one-shot importance_sampling path."""
    from pspde.eval import importance_sampling, make_is_runner
    from pspde.solvers import HJBSolver
    p = LLGC(d=2, T=0.5)
    s = HJBSolver("r", p, L=1, K=16, delta_t=0.05, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    run = make_is_runner(p, s, K=2048, delta_t=0.05)
    mean1, _, rel1 = jax.device_get(run(s.params, key))
    mean2, _, rel2 = importance_sampling(p, s, K=2048, delta_t=0.05,
                                         key=key)
    np.testing.assert_allclose(float(mean1), mean2, rtol=1e-4)
    np.testing.assert_allclose(float(rel1), rel2, rtol=1e-3)
