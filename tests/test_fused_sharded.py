"""dp-sharded fused training kernel == unsharded, values and gradients.

``make_fused_train_rollout_sharded`` (rollout/kernels.py) scales the
fused custom-VJP kernel over the path axis with ``jax.shard_map``; its
transpose must psum the per-shard parameter gradients of the replicated
weight leaves.  In host-noise mode every shard consumes the SAME
(N, d, K/n_dp) noise block, so the sharded run over K paths equals the
unsharded run over K/n_dp paths shard-by-shard — which pins down the
in/out specs, the seed plumbing and the gradient psum exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pspde.ansatz.transposed import make_transposed_apply
from pspde.losses.pathspace import log_variance_loss
from pspde.problems import LLGC
from pspde.rollout.kernels import (make_fused_train_rollout,
                                   make_fused_train_rollout_sharded)
from pspde.solvers import HJBSolver
from pspde.parallel import make_mesh

D, N, DT = 5, 8, 0.125
K_LOCAL = 16


@pytest.fixture(scope="module")
def setup():
    p = LLGC(d=D, T=1.0)
    s = HJBSolver("fused-shard-test", p, lr=1e-2, L=1, K=K_LOCAL,
                  delta_t=DT, time_approx="inner",
                  loss_method="log-variance", detach_forward=True,
                  learn_Y_0=True, verbose=False, early_stopping_time=None)
    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    noise = jax.random.normal(jax.random.PRNGKey(3), (N, D, K_LOCAL),
                              dtype=jnp.float32)
    leaves = tuple(jax.tree.leaves(s.params["z"]))
    return p, s, leaves_ex, z_apply_T, leaves, noise


def test_sharded_matches_unsharded(setup):
    p, s, leaves_ex, z_apply_T, leaves, noise = setup
    mesh = make_mesh(n_dp=8)
    n_dp = mesh.shape["dp"]
    u_tab = p.u_ref_table(np.arange(N) * DT)

    run_1 = make_fused_train_rollout(
        p, z_apply_T, leaves_ex, K_LOCAL, N, DT, adaptive_forward=True,
        u_tab=u_tab, tile=8, interpret=True, host_noise=noise)
    run_8 = make_fused_train_rollout_sharded(
        p, z_apply_T, leaves_ex, K_LOCAL * n_dp, N, DT, mesh=mesh,
        adaptive_forward=True, u_tab=u_tab, tile=8, interpret=True,
        host_noise=noise)

    seed = jnp.float32(0)
    ref = run_1(leaves, seed)
    out = run_8(leaves, seed)
    assert out.Y.shape == (K_LOCAL * n_dp,)
    for shard in range(n_dp):
        sl = slice(shard * K_LOCAL, (shard + 1) * K_LOCAL)
        np.testing.assert_allclose(out.XT[:, sl], ref.XT,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out.Y[sl], ref.Y, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(out.u_l2[sl], ref.u_l2,
                                   rtol=1e-5, atol=1e-6)

    # loss over identical per-shard copies == loss over one shard; the
    # replicated-leaves cotangent must psum to the same gradient
    def loss_1(lv):
        o = run_1(lv, seed)
        return log_variance_loss(o.Y, p.g(o.XT.T))

    def loss_8(lv):
        o = run_8(lv, seed)
        return log_variance_loss(o.Y, p.g(o.XT.T))

    g1 = jax.grad(loss_1)(leaves)
    g8 = jax.grad(loss_8)(leaves)
    for a, b in zip(g1, g8):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_sharded_rejects_bad_mesh(setup):
    p, _, leaves_ex, z_apply_T, _, _ = setup
    mesh = make_mesh(n_dp=8)
    with pytest.raises(ValueError, match="not divisible"):
        make_fused_train_rollout_sharded(
            p, z_apply_T, leaves_ex, 12, N, DT, mesh=mesh)


def test_sharded_fused_is_matches_unsharded(setup):
    """importance_sampling_fused(mesh=...): shard_mapped serve kernel.
    With per-shard host noise identical on every shard, the K-path
    sharded statistics equal the K/n_dp-path unsharded statistics up to
    the Bessel n/(n-1) factor."""
    from pspde.eval import importance_sampling_fused
    p, s, *_ = setup
    mesh = make_mesh(n_dp=8)
    noise = jax.random.normal(jax.random.PRNGKey(5), (20, 32, D),
                              dtype=jnp.float32)
    m1, v1, r1 = importance_sampling_fused(
        p, s, K=32, delta_t=0.05, tile=8, interpret=True,
        host_noise=noise)
    m8, v8, r8 = importance_sampling_fused(
        p, s, K=32 * 8, delta_t=0.05, tile=8, interpret=True, mesh=mesh,
        host_noise=noise)
    np.testing.assert_allclose(m8, m1, rtol=1e-5)
    np.testing.assert_allclose(v8, v1, rtol=0.05)
    np.testing.assert_allclose(r8, r1, rtol=0.05)


def test_is_scan_mesh_matches_unsharded(setup):
    """importance_sampling(mesh=...): dp sharding is placement only —
    the same key gives bitwise-equal statistics."""
    from pspde.eval import importance_sampling
    p, s, *_ = setup
    mesh = make_mesh(n_dp=8)
    key = jax.random.PRNGKey(11)
    a = importance_sampling(p, s, K=64, simulate_naive=True,
                            delta_t=0.05, key=key)
    b = importance_sampling(p, s, K=64, simulate_naive=True,
                            delta_t=0.05, key=key, mesh=mesh)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_solver_fused_train_with_mesh_falls_back_off_tpu():
    """rollout_mode='fused_train' + mesh on CPU: gated off (backend
    check) but the solver still trains via the sharded scan fallback."""
    p = LLGC(d=4, T=0.5)
    mesh = make_mesh(n_dp=8)
    s = HJBSolver("ft-mesh-fb", p, lr=1e-2, L=5, K=64, delta_t=0.1,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None, rollout_mode="fused_train",
                  mesh=mesh)
    s.train()
    assert len(s.loss_log) == 5
    assert np.isfinite(s.loss_log).all()


def test_sharded_fused_is_antithetic_matches_unsharded(setup):
    """antithetic=True under mesh: two shard_mapped runs with compile-time
    noise signs +1/-1 stay elementwise pair-aligned, so with per-shard
    host noise identical on every shard the K-path sharded statistics
    equal the K/n_dp-path unsharded ones up to the Bessel factor."""
    from pspde.eval import importance_sampling_fused
    p, s, *_ = setup
    mesh = make_mesh(n_dp=8)
    noise = jax.random.normal(jax.random.PRNGKey(6), (20, 16, D),
                              dtype=jnp.float32)
    m1, v1, r1 = importance_sampling_fused(
        p, s, K=32, delta_t=0.05, tile=8, interpret=True,
        host_noise=noise, antithetic=True)
    m8, v8, r8 = importance_sampling_fused(
        p, s, K=32 * 8, delta_t=0.05, tile=8, interpret=True, mesh=mesh,
        host_noise=noise, antithetic=True)
    np.testing.assert_allclose(m8, m1, rtol=1e-5)
    # n=16 vs n=128 pair-units: Bessel n/(n-1) factors differ by ~5.8%
    np.testing.assert_allclose(v8, v1, rtol=0.08)
    np.testing.assert_allclose(r8, r1, rtol=0.08)
