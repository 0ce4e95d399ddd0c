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
