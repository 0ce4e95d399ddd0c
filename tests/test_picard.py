"""Multi-stage Picard refinement drives a crude model to the true value."""

import jax
import jax.numpy as jnp

from pspde.ansatz import DenseNet
from pspde.eval import picard_refine
from tests.test_refine import _LinearH


def test_picard_converges_from_crude_net(key):
    p = _LinearH(d=3, T=0.25)
    x0 = jnp.asarray([0.3, -0.2, 0.1], jnp.float32)
    true0 = float(p.v_true(x0[None], jnp.zeros((1,)))[0])

    net = DenseNet(d_out=1, arch=(24, 24))
    params = net.init(key, jnp.zeros((1, 4)))  # random init, NOT trained
    val, stderr, _ = picard_refine(
        p, net, params, x0, n_stages=3, M=512, K_inner=128,
        delta_t=5e-3, reg_steps=1500, readout_K=100_000, key=key)
    rel = abs(float(val) - true0) / true0
    assert rel < 0.02, (float(val), true0, rel, float(stderr))


def test_picard_elliptic_contracts_committor():
    """Stopped-domain Picard (VERDICT r2 item 5): a deliberately corrupted
    committor model is pulled >=5x closer to the exact radial solution in
    one stage (h = 0: the Feynman-Kac targets are exact up to MC noise)."""
    import optax
    from pspde.ansatz import DenseNetTanh2
    from pspde.eval import picard_refine_elliptic
    from pspde.problems import Committor
    from pspde.rollout.sampling import sample_domain

    p = Committor(d=3)
    net = DenseNetTanh2(d_out=1, arch=(16, 8, 8))
    key = jax.random.PRNGKey(7)
    params = net.init(key, jnp.zeros((1, 3)))

    # corrupt: supervise the net onto 0.7 * v_ref + 0.15
    Xfit = sample_domain(jax.random.PRNGKey(1), p.geometry, 2048, 3)
    bad_targets = 0.7 * p.v_ref(Xfit) + 0.15
    tx = optax.adam(1e-2)
    state = tx.init(params)

    @jax.jit
    def fit_step(params, state):
        loss, g = jax.value_and_grad(
            lambda q: jnp.mean((net.apply(q, Xfit)[:, 0] - bad_targets) ** 2)
        )(params)
        up, state = tx.update(g, state, params)
        return optax.apply_updates(params, up), state, loss

    for _ in range(800):
        params, state, _ = fit_step(params, state)

    Xtest = sample_domain(jax.random.PRNGKey(2), p.geometry, 4096, 3)
    vr = p.v_ref(Xtest)
    mse_before = float(jnp.mean((net.apply(params, Xtest)[:, 0] - vr) ** 2))
    assert mse_before > 5e-3  # the corruption took

    refined, hist = picard_refine_elliptic(
        p, net, params, n_stages=1, M=512, K_inner=256, N_cap=512,
        delta_t=5e-3, reg_steps=2000, reg_lr=3e-3,
        key=jax.random.PRNGKey(3))
    mse_after = float(jnp.mean((net.apply(refined, Xtest)[:, 0] - vr) ** 2))
    assert hist[0]["cap_frac"] < 1e-3, hist
    assert mse_after < mse_before / 5.0, (mse_before, mse_after)


def test_mc_targets_elliptic_exact_model():
    """With the exact solution plugged in, the BGK-corrected targets match
    v_ref at the anchors to MC + discretization tolerance."""
    from pspde.eval.picard import mc_targets_elliptic
    from pspde.problems import Committor
    from pspde.rollout.sampling import sample_domain

    p = Committor(d=3)
    Xs = sample_domain(jax.random.PRNGKey(5), p.geometry, 64, 3)
    targets, cap_frac = mc_targets_elliptic(
        p, p.v_ref, Xs, K_inner=512, N_cap=512, delta_t=5e-3,
        key=jax.random.PRNGKey(6))
    err = jnp.abs(targets - p.v_ref(Xs))
    assert float(cap_frac) < 1e-3
    assert float(jnp.mean(err)) < 0.03, float(jnp.mean(err))


def test_fk_semigroup_fixes_eigenfunction():
    """e^{TA} v_ref = v_ref (lambda = 0) for the FP problem: the
    Feynman-Kac semigroup targets reproduce the exact eigenfunction at
    the anchors to MC tolerance (eval/eigen_power.py sign conventions)."""
    from pspde.eval import fk_semigroup_targets
    from pspde.problems import FokkerPlanckEigen

    p = FokkerPlanckEigen(d=2)
    key = jax.random.PRNGKey(4)
    Xs = 2 * jnp.pi * jax.random.uniform(key, (32, 2))
    t = fk_semigroup_targets(p, p.v_ref, Xs, K_inner=512, T_horizon=0.5,
                             delta_t=2e-3, key=key)
    rel = jnp.abs(t - p.v_ref(Xs)) / p.v_ref(Xs)
    assert float(jnp.mean(rel)) < 0.02, float(jnp.mean(rel))


def test_eigen_power_refine_contracts():
    """A corrupted eigenfunction model contracts toward v_ref under the
    semigroup power iteration."""
    import optax
    from pspde.ansatz import DenseNet
    from pspde.eval import eigen_power_refine
    from pspde.problems import FokkerPlanckEigen

    p = FokkerPlanckEigen(d=2)
    net = DenseNet(d_out=1, arch=(12, 12))
    key = jax.random.PRNGKey(8)
    params = net.init(key, jnp.zeros((1, 2)))
    Xf = 2 * jnp.pi * jax.random.uniform(key, (2048, 2))
    bad = p.v_ref(Xf) * (1.0 + 0.2 * jnp.sin(Xf[:, 0]))
    tx = optax.adam(1e-2)
    st = tx.init(params)

    @jax.jit
    def fit(params, st):
        l, g = jax.value_and_grad(lambda q: jnp.mean(
            (net.apply(q, Xf)[:, 0] - bad) ** 2))(params)
        up, st = tx.update(g, st, params)
        return optax.apply_updates(params, up), st

    for _ in range(1200):
        params, st = fit(params, st)

    Xt = 2 * jnp.pi * jax.random.uniform(jax.random.PRNGKey(9), (4096, 2))
    vr = p.v_ref(Xt)
    mse0 = float(jnp.mean((net.apply(params, Xt)[:, 0] - vr) ** 2))
    assert mse0 > 2e-3

    # contraction per stage ~ e^{-gap * T}; the d=2 torus gap is ~1, so
    # T=1.5 gives ~0.22 amplitude (0.05x MSE) per stage
    refined, hist = eigen_power_refine(
        p, net, params, n_stages=2, T_horizon=1.5, M=1024, K_inner=256,
        delta_t=2e-3, reg_steps=4000, K_center=8192,
        key=jax.random.PRNGKey(10))
    mse1 = float(jnp.mean((net.apply(refined, Xt)[:, 0] - vr) ** 2))
    assert mse1 < mse0 / 4, (mse0, mse1, hist)


def test_eigen_power_scf_schrodinger():
    """SCF mode: the cubic-nonlinearity Schroedinger eigenproblem's exact
    eigenfunction is a fixed point of the frozen-potential semigroup map
    (targets == e^{lambda... } growth absorbed by the L2 normalization)."""
    from pspde.eval import fk_semigroup_targets
    from pspde.problems import SchrodingerEigen

    p = SchrodingerEigen(d=2)
    key = jax.random.PRNGKey(12)
    Xs = 2 * jnp.pi * jax.random.uniform(key, (32, 2))
    T = 0.3

    def W_of(X):
        v = jnp.maximum(p.v_ref(X), 1e-3)
        return p.h(X, v, None) / v

    t = fk_semigroup_targets(p, p.v_ref, Xs, K_inner=1024, T_horizon=T,
                             delta_t=2e-3, key=key, W_of=W_of)
    # growth e^{-lambda T} = e^{3 T} at the exact eigenpair
    ratio = t / p.v_ref(Xs)
    lam_hat = float(-jnp.log(jnp.mean(ratio)) / T)
    assert abs(lam_hat - p.lambda_true) < 0.15, lam_hat


def test_picard_domain_anchors_refine_function_wide():
    """anchors='domain': one stage fits the net to Feynman-Kac MC targets
    drawn from the solver's own test measure (x ~ sample_domain,
    t ~ U(0, T)) — for the h = 0 heat equation the targets are exact up
    to MC noise, so a random-init net lands near the true value FUNCTION
    over the whole region (not just one point's tube)."""
    from pspde.eval.test_error import compute_test_error
    from pspde.problems import HeatEquation
    from pspde.problems.base import Geometry

    p = HeatEquation(d=5, T=0.2)
    p.geometry = Geometry(kind="unbounded", boundary_distance=2.0)
    key = jax.random.PRNGKey(3)
    net = DenseNet(d_out=1, arch=(25, 10, 10))
    params = net.init(key, jnp.zeros((1, 6)))  # random init, NOT trained

    def v_fn_of(q):
        return lambda XT: net.apply(q, XT)[:, 0]

    _, _, mre0 = compute_test_error(v_fn_of(params), p, 8192,
                                    jax.random.PRNGKey(9),
                                    modus="parabolic")
    val, stderr, refined = picard_refine(
        p, net, params, x0=None, anchors="domain", n_stages=1, M=1024,
        K_inner=256, delta_t=4e-3, reg_steps=3000, key=key)
    assert val is None and stderr is None
    _, _, mre1 = compute_test_error(v_fn_of(refined), p, 8192,
                                    jax.random.PRNGKey(9),
                                    modus="parabolic")
    assert float(mre1) < 0.05, (float(mre0), float(mre1))
    assert float(mre1) < 0.2 * float(mre0)

    # guards
    import pytest
    with pytest.raises(ValueError, match="x0"):
        picard_refine(p, net, params, x0=None, anchors="tube")
    with pytest.raises(ValueError, match="anchors"):
        picard_refine(p, net, params, x0=None, anchors="sphere")
