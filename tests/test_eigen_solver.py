"""Eigenvalue solver tests: Fokker-Planck (lambda = 0) and nonlinear
Schroedinger (lambda = -3) on the torus."""

import numpy as np

from pspde.ansatz import DenseNetTanh
from pspde.problems import FokkerPlanckEigen, SchrodingerEigen
from pspde.solvers import EigenSolver


def test_fokker_planck_lambda_and_eigenfunction():
    p = FokkerPlanckEigen(d=3)
    s = EigenSolver(p, "fp", L=400, K=256, K_boundary=64, N=20,
                    delta_t=1e-3, lr=1e-3, lr_lambda=0.01, lambda_init=0.5,
                    normalization="center", verbose=False)
    s.train()
    # lambda_true = 0; notebook reaches |lambda| ~ 5e-3 after 100k iters
    lam_avg = np.mean(s.lambda_log[-50:])
    assert abs(lam_avg) < 0.05
    assert s.V_L2_log[-1] < s.V_L2_log[0]


def test_schrodinger_lambda_moves_toward_true():
    p = SchrodingerEigen(d=3)
    net = DenseNetTanh(d_out=1, arch=(15, 15, 15, 15), output_relu=True)
    s = EigenSolver(p, "schroedinger", L=600, K=256, K_boundary=64, N=20,
                    delta_t=1e-3, lr=1e-3, lambda_init=-2.0,
                    normalization="l2_penalty", value_net=net,
                    verbose=False)
    s.train()
    # lambda_true = -3; from -2.0 it must move clearly toward it
    lam_avg = np.mean(s.lambda_log[-50:])
    assert lam_avg < -2.1
    assert np.isfinite(s.loss_log[-1])


def test_estimate_lambda_affine_identity_and_shift():
    """Y(lambda) is affine in lambda at frozen V, and shifting the base
    problem by h -> h + mu*y shifts the regression readout by exactly
    -mu (no training needed for either identity)."""
    from pspde.solvers.eigen import _LambdaShiftedProblem

    p = FokkerPlanckEigen(d=2)
    s = EigenSolver(p, "fp", L=30, K=128, K_boundary=32, N=10,
                    verbose=False)
    s.train()
    lam0, err0 = s.estimate_lambda(K=512, n_batches=4)
    assert np.isfinite(lam0) and err0 >= 0.0

    # shifted problem: same geometry/sigma, h + mu*y
    mu = 0.37
    shifted = _LambdaShiftedProblem(p, mu)
    shifted.geometry = p.geometry
    shifted.d = p.d
    s2 = EigenSolver.__new__(EigenSolver)
    s2.__dict__.update(s.__dict__)
    s2.problem = shifted
    lam1, _ = s2.estimate_lambda(K=512, n_batches=4)
    assert abs((lam1 + mu) - lam0) < 5e-3


def test_lambda_tail_mean():
    p = FokkerPlanckEigen(d=2)
    s = EigenSolver(p, "fp", L=20, K=64, K_boundary=32, N=5, verbose=False)
    assert s.lambda_tail_mean() is None
    s.train()
    assert abs(s.lambda_tail_mean(window=20)
               - np.mean(s.lambda_log)) < 1e-12
    assert s.lambda_tail_mean(window=1) == s.lambda_log[-1]


def test_loss_parts_logged():
    p = FokkerPlanckEigen(d=2)
    s = EigenSolver(p, "fp", L=5, K=64, K_boundary=32, N=5, verbose=False)
    s.train()
    assert len(s.loss_log_domain) == 5
    assert len(s.loss_log_boundary) == 5
    assert len(s.loss_log_derivative_boundary) == 5
    assert len(s.lambda_log) == 5
