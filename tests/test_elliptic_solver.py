"""Elliptic solver end-to-end tests on manufactured problems."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pspde.problems import (Committor, ExponentialOnBallNonlinearSin,
                            ExponentialOnSphere, Oscillations)
from pspde.rollout import sampling
from pspde.solvers import EllipticSolver


def _train(problem, method, L=300, **kw):
    defaults = dict(seed=42, delta_t=0.01, N=20, lr=3e-3, K=256,
                    K_boundary=64, verbose=False, print_every=10**6)
    defaults.update(kw)
    s = EllipticSolver(problem, method, loss_method=method, L=L, **defaults)
    s.train()
    return s


def test_diffusion_loss_converges_exponential_on_sphere():
    p = ExponentialOnSphere(d=3, alpha=1.0)
    s = _train(p, "diffusion", L=400, K_test_log=2048)
    assert s.loss_log[-1] < 0.05 * s.loss_log[0]
    assert s.V_test_L2[-1] < 0.02


@pytest.mark.parametrize("method", ["BSDE", "BSDE-2", "BSDE-3", "BSDE-4"])
def test_bsde_losses_run_and_improve(method):
    p = ExponentialOnSphere(d=2, alpha=0.5)
    s = _train(p, method, L=200, N=40, delta_t=0.02)
    assert np.isfinite(s.loss_log[-1])
    assert s.loss_log[-1] < s.loss_log[0]


def test_pinn_converges():
    p = ExponentialOnSphere(d=2, alpha=0.5)
    s = _train(p, "PINN", L=400, K_test_log=2048)
    assert s.V_test_L2[-1] < 0.02


def test_pinn_full_hessian_nondiagonal_sigma():
    from pspde.problems import ExponentialOnBallNonlinearSinHessian
    p = ExponentialOnBallNonlinearSinHessian(d=3, alpha=0.5)
    s = _train(p, "PINN", L=300, full_hessian=True, K_test_log=1024)
    assert np.isfinite(s.loss_log[-1])
    assert s.V_test_L2[-1] < 0.05


def test_nonlinear_sin_problem_diffusion():
    p = ExponentialOnBallNonlinearSin(d=5, alpha=0.5)
    s = _train(p, "diffusion", L=400, K_test_log=1024)
    assert s.V_test_L2[-1] < 0.05


def test_committor_two_spheres():
    p = Committor(d=5)
    s = _train(p, "diffusion", L=500, K_test_log=2048,
               alpha=(10.0, 1.0))
    # reference reaches ~1.5e-7 after 30k iters (Committor nb cell 10);
    # 500 iters only needs to be clearly on the convergence trend
    assert s.V_test_L2[-1] < 0.08
    assert s.V_test_L2[-1] < 0.3 * s.V_test_L2[0]


def test_square_geometry_oscillations():
    p = Oscillations(d=1)
    s = _train(p, "diffusion", L=500, lr=1e-2, K_test_log=1024)
    assert s.V_test_L2[-1] < 0.1


def test_variance_moment_split_runs():
    p = ExponentialOnSphere(d=2, alpha=0.5)
    s = _train(p, "diffusion", L=100, variance_moment_split=True)
    assert np.isfinite(s.loss_log[-1])


def test_neumann_boundary_runs():
    from pspde.problems import ExponentialOnBallNonlinear
    p = ExponentialOnBallNonlinear(d=3, alpha=0.5,
                                   boundary_type="Neumann")
    s = _train(p, "diffusion", L=150, boundary_type="Neumann",
               sample_center=True)
    assert np.isfinite(s.loss_log[-1])
    assert s.loss_log[-1] < s.loss_log[0]


# -- sampling unit tests ----------------------------------------------------

def test_sample_domain_ball_uniform(key):
    from pspde.problems.base import Geometry
    g = Geometry(kind="sphere", boundary_distance=2.0)
    x = sampling.sample_domain(key, g, 50000, 3)
    r = np.asarray(jnp.sqrt(jnp.sum(x ** 2, axis=-1)))
    assert r.max() <= 2.0 + 1e-5
    # uniform in ball: E[r^3 / R^3] = 1/2
    np.testing.assert_allclose(np.mean((r / 2.0) ** 3), 0.5, atol=0.01)


def test_sample_domain_annulus(key):
    from pspde.problems.base import Geometry
    g = Geometry(kind="two_spheres", boundary_distance_1=1.0,
                 boundary_distance_2=2.0)
    x = sampling.sample_domain(key, g, 50000, 3)
    r = np.asarray(jnp.sqrt(jnp.sum(x ** 2, axis=-1)))
    assert r.min() >= 1.0 - 1e-5 and r.max() <= 2.0 + 1e-5
    # exact uniform on annulus: (r^3 - 1)/(2^3 - 1) ~ U(0, 1)
    u = (r ** 3 - 1.0) / 7.0
    np.testing.assert_allclose(np.mean(u), 0.5, atol=0.01)


def test_sample_boundary_faces(key):
    from pspde.problems.base import Geometry
    g = Geometry(kind="square", X_l=-1.0, X_r=1.0)
    x = np.asarray(sampling.sample_boundary(key, g, 1000, 4))
    on_face = np.isclose(np.abs(x), 1.0).any(axis=-1)
    assert on_face.all()
    # first half pinned to X_l, second to X_r
    assert np.isclose(x[:500], -1.0).any(axis=-1).all()
    assert np.isclose(x[500:], 1.0).any(axis=-1).all()


def test_inside_fn_square_one_boundary():
    from pspde.problems.base import Geometry
    g = Geometry(kind="square", X_l=-2.0, X_r=1.0, one_boundary=True)
    fn = sampling.inside_fn(g)
    X = jnp.zeros((3, 1))
    Xp = jnp.array([[0.5], [1.5], [-5.0]])
    got = np.asarray(fn(X, Xp))
    # one_boundary: only the X_r face stops (solver.py:755-756)
    assert got.tolist() == [True, False, True]


def test_oracle_less_problem_gates_diagnostics():
    """PINN V_L2 and sample_center must not dereference a missing v_ref
    (VERDICT r4 item 7: the reference crashes here, solver.py:828-931)."""
    from pspde.problems.elliptic import _ZeroDriftBall

    class NoOracle(_ZeroDriftBall):
        def __init__(self, d=2):
            super().__init__(d=d,
                             B=jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32))
            self.name = "no-oracle"

        def g(self, x):
            return jnp.sum(x * x, axis=-1)

        def h(self, x, y, z):
            return jnp.zeros(x.shape[0], x.dtype)

        def h_T(self, xT, y, zT):
            return jnp.zeros(xT.shape[1], xT.dtype)

    p = NoOracle(d=2)
    assert not p.has_v_ref
    s = _train(p, "PINN", L=3)
    assert np.isnan(s.V_L2_log[-1])          # NaN metric, not a crash
    assert np.isfinite(s.loss_log[-1])
    s2 = _train(p, "diffusion", L=3, sample_center=True)
    assert np.isfinite(s2.loss_log[-1])
