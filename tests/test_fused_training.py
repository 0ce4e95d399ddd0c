"""Fused (Pallas) training rollout == scan rollout, values and gradients.

``hjb_rollout_fused`` runs the parameter-free forward path in one Pallas
kernel and reconstructs the driving noise from the path increments
(rollout/sde.py: _assemble_hjb_from_path).  In ``host_noise`` mode the
kernel consumes the exact fold_in noise stream of :func:`hjb_rollout`, so
outputs and loss gradients must agree to f32 tolerance.  The in-kernel
TPU-PRNG path is exercised on real hardware only (bench.py) and is
statistically, not bitwise, equivalent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pspde.losses.pathspace import log_variance_loss
from pspde.problems import LLGC
from pspde.rollout.sde import (HJBRolloutConfig, hjb_rollout,
                               hjb_rollout_fused)
from pspde.solvers import HJBSolver

K, D, N, DT = 64, 6, 12, 1.0 / 12


@pytest.fixture(scope="module")
def setup():
    p = LLGC(d=D, T=1.0)
    s = HJBSolver("fused-test", p, lr=1e-2, L=1, K=K, delta_t=DT,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None)
    cfg = s._rollout_cfg(0)
    control_fn = s._control_fn()
    z_treedef = jax.tree.structure(s.params["z"])
    z_net = s.z_net

    def u_apply(leaves_t, tX):
        prm = jax.tree.unflatten(z_treedef, list(leaves_t))
        return -z_net.apply(prm, tX)

    key = jax.random.PRNGKey(7)
    noise = jnp.stack([
        jax.random.normal(jax.random.fold_in(key, n), (K, D),
                          dtype=jnp.float32) for n in range(N)])
    X0 = jnp.broadcast_to(p.X_0, (K, D)).astype(jnp.float32)
    Y0 = jnp.zeros((K,), jnp.float32)
    return p, s, cfg, control_fn, u_apply, key, noise, X0, Y0


def _fused(setup, params):
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    leaves = tuple(jax.tree.leaves(params["z"]))
    return hjb_rollout_fused(cfg, p, control_fn, params, u_apply, leaves,
                             X0, Y0, key, u_ref=s._u_ref,
                             interpret=True, host_noise=noise)


def test_fused_matches_scan_outputs(setup):
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    # note: cfg.N == s.N which the solver derived from T/delta_t
    assert cfg.N == N
    ref = hjb_rollout(cfg, p, control_fn, s.params, X0, Y0, key,
                      u_ref=s._u_ref)
    out = _fused(setup, s.params)
    np.testing.assert_allclose(out.X, ref.X, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out.Y, ref.Y, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out.u_l2, ref.u_l2, rtol=2e-4, atol=2e-4)


def test_fused_matches_scan_gradients(setup):
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup

    def loss_scan(params):
        out = hjb_rollout(cfg, p, control_fn, params, X0, Y0, key,
                          u_ref=s._u_ref)
        return log_variance_loss(out.Y, p.g(out.X))

    def loss_fused(params):
        out = _fused(setup, params)
        return log_variance_loss(out.Y, p.g(out.X))

    g_ref = jax.grad(loss_scan)(s.params)
    g_fus = jax.grad(loss_fused)(s.params)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-5)


def test_solver_fused_mode_falls_back_off_tpu(setup):
    """rollout_mode='fused' must silently use the batched-grad path on
    non-TPU backends (guard in hjb.py _build_step) and still train."""
    p = LLGC(d=4, T=0.5)
    s = HJBSolver("fused-fallback", p, lr=1e-2, L=5, K=32, delta_t=0.1,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None, rollout_mode="fused")
    s.train()
    assert len(s.loss_log) == 5
    assert np.isfinite(s.loss_log).all()


def test_nested_remat_long_n_matches_plain_scan():
    """stopped_rollout's sqrt-schedule scan-of-scans (cfg.remat, N > 2048)
    must produce identical outputs AND loss gradients to the plain scan
    (remat changes memory scheduling, not math); padding steps beyond N
    are masked to no-ops."""
    from pspde.problems import ExponentialOnBallNonlinearSin
    from pspde.rollout.sampling import inside_fn, sample_domain
    from pspde.rollout.sde import StoppedRolloutConfig, stopped_rollout
    from pspde.ansatz import DenseNet

    p = ExponentialOnBallNonlinearSin(d=4, alpha=1.0)
    net = DenseNet(d_out=1, arch=(8, 8))
    key = jax.random.PRNGKey(3)
    params = net.init(key, jnp.zeros((1, 4)))
    X0 = sample_domain(key, p.geometry, 16, 4)
    ins = inside_fn(p.geometry)

    def vg(prm, X, t):
        v_of_x = lambda x: net.apply(prm, x)[:, 0]
        V, pull = jax.vjp(v_of_x, X)
        (g,) = pull(jnp.ones_like(V))
        return V, p.sigma_struct.apply_T(g)

    def loss(prm, remat):
        # N=2500 > 2048 triggers the nested path only when remat=True
        cfg = StoppedRolloutConfig(N=2500, delta_t=1e-3, remat=remat)
        out = stopped_rollout(cfg, p, vg, prm, X0,
                              net.apply(prm, X0)[:, 0], jnp.zeros((16,)),
                              key, ins)
        return jnp.mean((p.g(out.X) - out.Y) ** 2), out

    (l_plain, o_plain), g_plain = jax.value_and_grad(
        lambda prm: loss(prm, False), has_aux=True)(params)
    (l_remat, o_remat), g_remat = jax.value_and_grad(
        lambda prm: loss(prm, True), has_aux=True)(params)
    np.testing.assert_allclose(l_plain, l_remat, rtol=1e-6)
    np.testing.assert_allclose(o_plain.Y, o_remat.Y, rtol=1e-5, atol=1e-6)
    assert bool(jnp.all(o_plain.stopped == o_remat.stopped))
    np.testing.assert_allclose(o_plain.hitting, o_remat.hitting)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_hjb_nested_remat_matches_plain_scan():
    """hjb_rollout with remat at N > 2048 (sqrt scan-of-scans via
    _remat_scan) == plain scan, outputs and gradients."""
    import dataclasses
    p = LLGC(d=3, T=1.0)
    s = HJBSolver("hjb-longN", p, lr=1e-2, L=1, K=16, delta_t=1.0 / 2500,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None)
    assert s.N == 2500
    cfg = s._rollout_cfg(0)
    control_fn = s._control_fn()
    key = jax.random.PRNGKey(5)
    X0 = jnp.broadcast_to(p.X_0, (16, 3)).astype(jnp.float32)
    Y0 = jnp.zeros((16,), jnp.float32)

    def loss(prm, remat):
        out = hjb_rollout(dataclasses.replace(cfg, remat=remat), p,
                          control_fn, prm, X0, Y0, key, u_ref=s._u_ref)
        return log_variance_loss(out.Y, p.g(out.X))

    l_plain, g_plain = jax.value_and_grad(lambda q: loss(q, False))(s.params)
    l_remat, g_remat = jax.value_and_grad(lambda q: loss(q, True))(s.params)
    np.testing.assert_allclose(l_plain, l_remat, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_plain), jax.tree.leaves(g_remat)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-7)


def test_fused_train_kernel_matches_scan(setup):
    """make_fused_train_rollout (fwd+bwd Pallas kernels, transposed
    K-in-lanes layout) == hjb_rollout: outputs AND parameter gradients,
    on the identical injected noise stream."""
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    from pspde.ansatz.transposed import make_transposed_apply
    from pspde.rollout.kernels import make_fused_train_rollout

    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    noise_T = jnp.transpose(noise, (0, 2, 1))       # (N, d, K)
    run = make_fused_train_rollout(
        p, z_apply_T, leaves_ex, K, N, DT, adaptive_forward=True,
        u_tab=p.u_ref_table(np.arange(N) * DT), tile=32,
        interpret=True, host_noise=noise_T)

    ref = hjb_rollout(cfg, p, control_fn, s.params, X0, Y0, key,
                      u_ref=s._u_ref)
    leaves = tuple(jax.tree.leaves(s.params["z"]))
    out = run(leaves, jnp.float32(0))
    np.testing.assert_allclose(out.XT.T, ref.X, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(out.Y, ref.Y, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(out.u_l2, ref.u_l2, rtol=2e-4, atol=2e-4)

    treedef = jax.tree.structure(s.params["z"])

    def loss_scan(params):
        o = hjb_rollout(cfg, p, control_fn, params, X0, Y0, key,
                        u_ref=s._u_ref)
        return log_variance_loss(o.Y, p.g(o.X))

    def loss_fused(leaves):
        o = run(leaves, jnp.float32(0))
        return log_variance_loss(o.Y, p.g(o.XT.T))

    g_ref = jax.grad(loss_scan)(s.params)["z"]
    g_fus = jax.tree.unflatten(treedef, list(jax.grad(loss_fused)(leaves)))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-6)


def test_fused_train_kernel_kl_accumulator(setup):
    """Z_sum (relative-entropy accumulator) and its gradient flow through
    the fused training kernel's custom VJP."""
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    import dataclasses
    from pspde.ansatz.transposed import make_transposed_apply
    from pspde.rollout.kernels import make_fused_train_rollout

    cfg_kl = dataclasses.replace(cfg, accumulate_kl=True)
    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    noise_T = jnp.transpose(noise, (0, 2, 1))
    run = make_fused_train_rollout(
        p, z_apply_T, leaves_ex, K, N, DT, adaptive_forward=True,
        accumulate_kl=True, u_tab=None, tile=32,
        interpret=True, host_noise=noise_T)
    ref = hjb_rollout(cfg_kl, p, control_fn, s.params, X0, Y0, key)
    leaves = tuple(jax.tree.leaves(s.params["z"]))
    out = run(leaves, jnp.float32(0))
    np.testing.assert_allclose(out.Z_sum, ref.Z_sum, rtol=2e-4, atol=2e-4)

    def loss_scan(params):
        o = hjb_rollout(cfg_kl, p, control_fn, params, X0, Y0, key)
        return jnp.mean(o.Z_sum + p.g(o.X))

    def loss_fused(leaves):
        o = run(leaves, jnp.float32(0))
        return jnp.mean(o.Z_sum + p.g(o.XT.T))

    treedef = jax.tree.structure(s.params["z"])
    g_ref = jax.grad(loss_scan)(s.params)["z"]
    g_fus = jax.tree.unflatten(treedef, list(jax.grad(loss_fused)(leaves)))
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fus)):
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-6)


def test_fused_train_kernel_unroll_bitwise(setup):
    """The manually-unrolled time loop (unroll=2/4, the r3 perf default)
    is bitwise identical to unroll=1: outputs, loss and parameter
    gradients, on the identical injected noise stream."""
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    from pspde.ansatz.transposed import make_transposed_apply
    from pspde.rollout.kernels import make_fused_train_rollout

    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    noise_T = jnp.transpose(noise, (0, 2, 1))
    leaves = tuple(jax.tree.leaves(s.params["z"]))
    kw = dict(adaptive_forward=True, u_tab=p.u_ref_table(np.arange(N) * DT),
              tile=32, interpret=True, host_noise=noise_T)

    def run_with(unroll):
        run = make_fused_train_rollout(
            p, z_apply_T, leaves_ex, K, N, DT, unroll=unroll, **kw)

        def loss(lv):
            o = run(lv, jnp.float32(0))
            return log_variance_loss(o.Y, p.g(o.XT.T)), o

        (l, o), g = jax.value_and_grad(loss, has_aux=True)(leaves)
        return l, o, g

    l1, o1, g1 = run_with(1)
    for u in (2, 4):
        l, o, g = run_with(u)
        assert np.array_equal(np.asarray(l), np.asarray(l1))
        assert np.array_equal(np.asarray(o.Y), np.asarray(o1.Y))
        assert np.array_equal(np.asarray(o.XT), np.asarray(o1.XT))
        for a, b in zip(g, g1):
            assert np.array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(ValueError, match="unroll"):
        make_fused_train_rollout(
            p, z_apply_T, leaves_ex, K, N, DT, unroll=5, **kw)


def test_solver_fused_train_mode_falls_back_off_tpu():
    """rollout_mode='fused_train' silently falls back off-TPU and trains."""
    p = LLGC(d=4, T=0.5)
    s = HJBSolver("ft-fallback", p, lr=1e-2, L=5, K=32, delta_t=0.1,
                  time_approx="inner", loss_method="log-variance",
                  detach_forward=True, learn_Y_0=True, verbose=False,
                  early_stopping_time=None, rollout_mode="fused_train")
    s.train()
    assert len(s.loss_log) == 5
    assert np.isfinite(s.loss_log).all()


def test_fused_train_kernel_tile_calibration_cap(setup):
    """The scoped-VMEM calibration caps d * tile * ceil(unroll/2) at the
    measured v5e fit boundary (499200, round-4 probe grid) so large-d
    configs auto-shrink instead of crashing the TPU compile helper;
    explicit smaller tiles pass through untouched."""
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    from pspde.ansatz.transposed import make_transposed_apply
    from pspde.problems import LLGC
    from pspde.rollout.kernels import make_fused_train_rollout

    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    kw = dict(adaptive_forward=True, u_tab=None, interpret=True)
    # small d: the default tile survives (no cap bites)
    r = make_fused_train_rollout(p, z_apply_T, leaves_ex, K, N, DT, **kw)
    assert r.tile == 4096 and r.unroll == 2
    # explicit tiny tile passes through
    r = make_fused_train_rollout(p, z_apply_T, leaves_ex, K, N, DT,
                                 tile=32, **kw)
    assert r.tile == 32
    # big d: capped to the calibration product, lane-multiple of 128
    p300 = LLGC(d=300, T=1.0)
    s300 = HJBSolver("cap300", p300, lr=1e-2, L=1, K=K, delta_t=DT,
                     time_approx="inner", loss_method="log-variance",
                     detach_forward=True, learn_Y_0=True, verbose=False,
                     early_stopping_time=None)
    lv300, zT300 = make_transposed_apply(s300.z_net, s300.params["z"])
    r = make_fused_train_rollout(p300, zT300, lv300, K, N, DT, **kw)
    assert r.tile * 300 * ((r.unroll + 1) // 2) <= 499_200
    assert r.tile % 128 == 0
    # d=1000 (the round-3 Mosaic wall): now admits a nonzero tile
    p1k = LLGC(d=1000, T=1.0)
    s1k = HJBSolver("cap1k", p1k, lr=1e-2, L=1, K=K, delta_t=DT,
                    time_approx="inner", loss_method="log-variance",
                    detach_forward=True, learn_Y_0=True, verbose=False,
                    early_stopping_time=None)
    lv1k, zT1k = make_transposed_apply(s1k.z_net, s1k.params["z"])
    r = make_fused_train_rollout(p1k, zT1k, lv1k, K, N, DT, **kw)
    assert r.tile == 384 and r.unroll == 2  # the measured-good config
    # solver kwargs plumb through to the kernel
    s2 = HJBSolver("ft-tile", LLGC(d=4, T=0.5), lr=1e-2, L=2, K=32,
                   delta_t=0.1, time_approx="inner",
                   loss_method="log-variance", detach_forward=True,
                   learn_Y_0=True, verbose=False, early_stopping_time=None,
                   rollout_mode="fused_train", fused_tile=256,
                   fused_unroll=1)
    assert s2.fused_tile == 256 and s2.fused_unroll == 1
    s2.train()
    assert np.isfinite(s2.loss_log).all()


def test_fused_train_noise_sign_mirrors(setup):
    """noise_sign=-1 with host noise xi == noise_sign=+1 with host noise
    -xi, bitwise — outputs AND parameter gradients (the antithetic
    fused_train pairing: two kernels, same seed, signs +/-1)."""
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    from pspde.ansatz.transposed import make_transposed_apply
    from pspde.rollout.kernels import make_fused_train_rollout

    leaves_ex, z_apply_T = make_transposed_apply(s.z_net, s.params["z"])
    noise_T = jnp.transpose(noise, (0, 2, 1))
    kw = dict(adaptive_forward=True, accumulate_kl=True, u_tab=None,
              tile=32, interpret=True)
    run_neg = make_fused_train_rollout(
        p, z_apply_T, leaves_ex, K, N, DT, noise_sign=-1.0,
        host_noise=noise_T, **kw)
    run_mirror = make_fused_train_rollout(
        p, z_apply_T, leaves_ex, K, N, DT, host_noise=-noise_T, **kw)
    leaves = tuple(jax.tree.leaves(s.params["z"]))
    o1 = run_neg(leaves, jnp.float32(0))
    o2 = run_mirror(leaves, jnp.float32(0))
    for a, b in zip(o1, o2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def loss(r):
        def f(lv):
            o = r(lv, jnp.float32(0))
            return jnp.mean(o.Z_sum + p.g(o.XT.T))
        return jax.grad(f)(leaves)

    for a, b in zip(loss(run_neg), loss(run_mirror)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_antithetic_fused_train_gate_and_shapes():
    """HJBSolver(antithetic=True, rollout_mode='fused_train') is accepted
    (r4 raised ValueError) and falls back to the scan off-TPU, where the
    antithetic scan trains fine; 'fused' still raises."""
    import warnings
    p = LLGC(d=D, T=1.0)
    with pytest.raises(ValueError, match="fused"):
        HJBSolver("anti-fused", p, L=1, K=K, delta_t=DT,
                  loss_method="relative_entropy", detach_forward=True,
                  time_approx="inner", verbose=False, antithetic=True,
                  early_stopping_time=None, rollout_mode="fused")
    # moment: a detach-compatible mean loss (relative_entropy + detach
    # has a degenerate gradient — the __init__ warning covers it)
    s = HJBSolver("anti-ft", p, L=2, K=K, delta_t=DT,
                  loss_method="moment", learn_Y_0=True,
                  detach_forward=True,
                  time_approx="inner", verbose=False, antithetic=True,
                  early_stopping_time=None, rollout_mode="fused_train")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        s.train()
    # no TPU in CI: falls back to batched_grad (path_grad_ok holds)
    assert s.resolved_rollout_mode in ("scan", "batched_grad")
    assert np.isfinite(s.loss_log).all() and len(s.loss_log) == 2


def test_fused_train_nonstandard_leaf_ranks(setup):
    """The fused custom-VJP backward accepts 0-d and rank-3 param leaves
    (code review r5: the grad-accumulator shapes used (1, x.shape[0]),
    which raised IndexError on 0-d leaves and disagreed with _canon2d's
    (1, size) flattening for rank>=3 leaves).  Equivalence oracle: the
    same control re-packed with all-2-d leaves must give identical
    outputs and (reshaped) identical gradients."""
    p, s, cfg, control_fn, u_apply, key, noise, X0, Y0 = setup
    from pspde.rollout.kernels import make_fused_train_rollout

    k1, k3 = jax.random.split(jax.random.PRNGKey(3))
    w = 0.1 * jax.random.normal(k1, (D, D), jnp.float32)
    b = jnp.float32(0.3)                                   # 0-d leaf
    c = 0.1 * jax.random.normal(k3, (2, 1, D), jnp.float32)  # rank-3 leaf

    def z_apply_T(leaves, tXT):
        w_, b_, c_ = leaves
        cc = c_.reshape(2, D)
        return w_ @ tXT[1:, :] + b_ + (cc[0] + cc[1]).reshape(D, 1)

    def z_apply_T2(leaves, tXT):
        w_, b_, cc = leaves
        return w_ @ tXT[1:, :] + b_[0, 0] + (cc[0] + cc[1]).reshape(D, 1)

    leaves = (w, b, c)
    leaves2 = (w, b.reshape(1, 1), c.reshape(2, D))
    noise_T = jnp.transpose(noise, (0, 2, 1))
    kw = dict(adaptive_forward=True, accumulate_kl=True, u_tab=None,
              tile=32, interpret=True, host_noise=noise_T)
    run = make_fused_train_rollout(p, z_apply_T, leaves, K, N, DT, **kw)
    run2 = make_fused_train_rollout(p, z_apply_T2, leaves2, K, N, DT, **kw)

    o1 = run(leaves, jnp.float32(0))
    o2 = run2(leaves2, jnp.float32(0))
    np.testing.assert_array_equal(np.asarray(o1.XT), np.asarray(o2.XT))
    np.testing.assert_array_equal(np.asarray(o1.Y), np.asarray(o2.Y))

    def loss(r, lv):
        o = r(lv, jnp.float32(0))
        return jnp.mean(o.Z_sum + p.g(o.XT.T))

    g1 = jax.grad(lambda lv: loss(run, lv))(leaves)
    g2 = jax.grad(lambda lv: loss(run2, lv))(leaves2)
    assert g1[1].shape == () and g1[2].shape == (2, 1, D)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a).ravel(),
                                   np.asarray(b2).ravel(), rtol=1e-5)
