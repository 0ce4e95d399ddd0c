"""Fused stopped-rollout training kernel == stopped_rollout scan.

``make_fused_stopped_train_rollout`` (rollout/kernels.py) runs the
stopped Euler-Maruyama rollout of the diffusion-loss family
(solver.py:723-785) as one Pallas kernel per direction, with the
backward REPLAYING the forward and accumulating grad-of-grad per-step
VJPs (Z = sigma^T grad V makes the in-step math first-order already).
In ``host_noise`` mode the kernel consumes the exact fold_in noise
stream of :func:`stopped_rollout`, so states, masks, accumulators AND
loss gradients must agree to f32 tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pspde.ansatz import DenseNet
from pspde.ansatz.transposed import make_transposed_apply, transposed_apply
from pspde.problems import (ExponentialOnSphere,
                            ExponentialOnSphereNonlinearParabolic)
from pspde.rollout.kernels import (FusedStoppedOut,
                                   make_fused_stopped_train_rollout)
from pspde.rollout.sampling import inside_fn, inside_fn_cols
from pspde.rollout.sde import StoppedRolloutConfig, stopped_rollout

K, D, N, DT = 64, 4, 16, 0.01


def _mk_terms(problem, net, params, time_stopping=False):
    """The solver-side terms_math: (V, Z = sigma^T grad V, h) at the
    pre-step state with y_in_h = V (non-recursive losses)."""
    sig = problem.sigma_struct
    treedef = jax.tree.structure(params)

    def terms(leaves, XT, t_row):
        prm = jax.tree.unflatten(treedef, list(leaves))
        if time_stopping:
            def v_of_xT(xT):
                xtT = jnp.concatenate([xT, t_row], axis=0)
                return transposed_apply(net, prm, xtT)[0, :]
        else:
            def v_of_xT(xT):
                return transposed_apply(net, prm, xT)[0, :]
        V, pull = jax.vjp(v_of_xT, XT)
        (gradXT,) = pull(jnp.ones_like(V))
        ZT = sig.apply_T_cols(gradXT)
        if time_stopping:
            hv = problem.h_T(t_row[0, :], XT, V, ZT)
        else:
            hv = problem.h_T(XT, V, ZT)
        return V.reshape(1, -1), ZT, hv.reshape(1, -1)

    return terms


def _vg_fn(problem, net, time_stopping=False):
    sig = problem.sigma_struct

    def fn(params, X, t):
        if time_stopping:
            def v_of_x(x):
                xt = jnp.concatenate([x, t[:, None]], axis=-1)
                return net.apply(params, xt)[:, 0]
        else:
            def v_of_x(x):
                return net.apply(params, x)[:, 0]
        V, pull = jax.vjp(v_of_x, X)
        (gradX,) = pull(jnp.ones_like(V))
        return V, sig.apply_T(gradX)

    return fn


def _setup(problem, time_stopping=False, seed=3):
    d = problem.d
    net = DenseNet(d_out=1, arch=(8, 8))
    params = net.init(jax.random.PRNGKey(seed),
                      jnp.zeros((1, d + (1 if time_stopping else 0))))
    key = jax.random.PRNGKey(11)
    noise = jnp.stack([
        jax.random.normal(jax.random.fold_in(key, n), (K, d),
                          dtype=jnp.float32) for n in range(N)])
    kx, kt = jax.random.split(jax.random.PRNGKey(5))
    from pspde.rollout.sampling import sample_domain
    X0 = sample_domain(kx, problem.geometry, K, d)
    t0 = (jax.random.uniform(kt, (K,)) * problem.T if time_stopping
          else jnp.zeros((K,)))
    return net, params, key, noise, X0, t0


def _run_both(problem, adaptive=False, time_stopping=False,
              with_v_ref=False):
    net, params, key, noise, X0, t0 = _setup(problem, time_stopping)
    cfg = StoppedRolloutConfig(
        N=N, delta_t=DT, adaptive_forward=adaptive, detach_forward=True,
        time_stopping=time_stopping)
    vg = _vg_fn(problem, net, time_stopping)
    ins = inside_fn(problem.geometry)
    v_ref = problem.v_ref if (with_v_ref and not time_stopping) else None
    ref = stopped_rollout(cfg, problem, vg, params, X0, jnp.zeros((K,)),
                          t0, key, ins, v_ref=v_ref)

    leaves_ex = tuple(jax.tree.leaves(params))
    terms = _mk_terms(problem, net, params, time_stopping)
    run = make_fused_stopped_train_rollout(
        problem, terms, leaves_ex, K, N, DT,
        inside_fn_T=inside_fn_cols(problem.geometry),
        adaptive_forward=adaptive, time_stopping=time_stopping,
        v_ref_T=(problem.v_ref_T if (with_v_ref and not time_stopping)
                 else None),
        tile=32, interpret=True,
        host_noise=jnp.transpose(noise, (0, 2, 1)))
    leaves = tuple(jax.tree.leaves(params))
    out = run(leaves, X0.T, t0, jnp.float32(0))
    return net, params, X0, t0, ref, out, run, leaves, key, noise


def _assert_outputs_match(ref, out):
    np.testing.assert_allclose(np.asarray(out.XT.T), np.asarray(ref.X),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(out.Y), np.asarray(ref.Y),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(out.stopped) > 0.5,
                                  np.asarray(ref.stopped))
    np.testing.assert_allclose(np.asarray(out.hitting),
                               np.asarray(ref.hitting), atol=0)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(jnp.sum(out.adv_steps)),
                               float(ref.active_count), atol=0)


def test_fused_stopped_matches_scan_elliptic():
    p = ExponentialOnSphere(d=D, alpha=0.5)
    net, params, X0, t0, ref, out, *_ = _run_both(p, with_v_ref=True)
    # some paths must actually have stopped for the masks to be exercised
    assert 0 < int(np.asarray(ref.stopped).sum()) < K
    _assert_outputs_match(ref, out)
    np.testing.assert_allclose(np.asarray(out.v_l2), np.asarray(ref.v_l2),
                               rtol=2e-4, atol=1e-6)


def test_fused_stopped_matches_scan_adaptive():
    p = ExponentialOnSphere(d=D, alpha=0.5)
    net, params, X0, t0, ref, out, *_ = _run_both(p, adaptive=True)
    _assert_outputs_match(ref, out)


def test_fused_stopped_matches_scan_time_stopping():
    p = ExponentialOnSphereNonlinearParabolic(d=D, alpha=0.5)
    net, params, X0, t0, ref, out, *_ = _run_both(p, time_stopping=True)
    assert 0 < int(np.asarray(ref.stopped).sum())
    _assert_outputs_match(ref, out)


@pytest.mark.parametrize("adaptive", [False, True])
def test_fused_stopped_gradients_match(adaptive):
    """Diffusion-loss gradient through the custom VJP == gradient through
    the scan (the full second-order path: d/dtheta of sums of
    sigma^T grad V terms)."""
    p = ExponentialOnSphere(d=D, alpha=0.5)
    (net, params, X0, t0, ref, out, run, leaves, key,
     noise) = _run_both(p, adaptive=adaptive)

    cfg = StoppedRolloutConfig(
        N=N, delta_t=DT, adaptive_forward=adaptive, detach_forward=True)
    vg = _vg_fn(p, net)
    ins = inside_fn(p.geometry)

    def loss_scan(prm):
        v_fn = lambda X: net.apply(prm, X)[:, 0]
        Y0 = v_fn(X0)
        o = stopped_rollout(cfg, p, vg, prm, X0, Y0, t0, key, ins)
        return jnp.mean((v_fn(o.X) - o.Y) ** 2)

    treedef = jax.tree.structure(params)

    def loss_fused(lv):
        prm = jax.tree.unflatten(treedef, list(lv))
        v_fn = lambda X: net.apply(prm, X)[:, 0]
        o = run(lv, X0.T, t0, jnp.float32(0))
        Y = v_fn(X0) + o.Y
        return jnp.mean((v_fn(o.XT.T) - Y) ** 2)

    l1 = loss_scan(params)
    l2 = loss_fused(leaves)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-4)

    g1 = jax.tree.leaves(jax.grad(loss_scan)(params))
    g2 = jax.grad(loss_fused)(leaves)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)


def test_fused_stopped_sharded_matches_unsharded():
    """8-device dp shard_map == single kernel on the same host noise."""
    from pspde.parallel import make_mesh
    from pspde.rollout.kernels import (
        make_fused_stopped_train_rollout_sharded)
    p = ExponentialOnSphere(d=D, alpha=0.5)
    net, params, key, noise, X0, t0 = _setup(p)
    mesh = make_mesh(n_dp=8)
    leaves_ex = tuple(jax.tree.leaves(params))
    terms = _mk_terms(p, net, params)
    kw = dict(inside_fn_T=inside_fn_cols(p.geometry), tile=8,
              interpret=True,
              host_noise=jnp.transpose(noise[:, :K // 8], (0, 2, 1)))
    run1 = make_fused_stopped_train_rollout(
        p, terms, leaves_ex, K // 8, N, DT, **kw)
    run8 = make_fused_stopped_train_rollout_sharded(
        p, terms, leaves_ex, K, N, DT, mesh=mesh, **kw)
    leaves = tuple(jax.tree.leaves(params))
    o1 = run1(leaves, X0[:K // 8].T, t0[:K // 8], jnp.float32(0))
    X0_rep = jnp.tile(X0[:K // 8], (8, 1))
    o8 = run8(leaves, X0_rep.T, jnp.tile(t0[:K // 8], 8), jnp.float32(0))
    np.testing.assert_allclose(np.asarray(o8.Y[:K // 8]),
                               np.asarray(o1.Y), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(o8.XT[:, :K // 8]),
                               np.asarray(o1.XT), rtol=1e-5, atol=1e-6)


def test_eigen_fused_terms_match_scan_with_lambda_grad():
    """EigenSolver._terms_math_T + fused kernel == lambda-shifted scan,
    values AND gradients (lambda rides the leaves tuple; its gradient
    must flow through the in-kernel VJP and be nonzero)."""
    from pspde.problems import FokkerPlanckEigen
    from pspde.solvers import EigenSolver
    from pspde.solvers.eigen import _LambdaShiftedProblem
    p = FokkerPlanckEigen(d=3)
    s = EigenSolver(p, "eig-fused", L=1, K=K, N=N, delta_t=DT,
                    verbose=False, lambda_init=0.3)
    key = jax.random.PRNGKey(2)
    noise = jnp.stack([
        jax.random.normal(jax.random.fold_in(key, n), (K, 3),
                          dtype=jnp.float32) for n in range(N)])
    from pspde.rollout.sampling import sample_domain
    X0 = sample_domain(jax.random.PRNGKey(9), p.geometry, K, 3)
    zeros = jnp.zeros((K,))

    terms = s._terms_math_T()
    leaves_ex = tuple(jax.tree.leaves(s.params))
    run = make_fused_stopped_train_rollout(
        p, terms, leaves_ex, K, N, DT,
        inside_fn_T=inside_fn_cols(p.geometry), v_ref_T=p.v_ref_T,
        tile=32, interpret=True,
        host_noise=jnp.transpose(noise, (0, 2, 1)))

    sig = p.sigma_struct
    cfg = StoppedRolloutConfig(N=N, delta_t=DT, detach_forward=True)
    ins = inside_fn(p.geometry)

    def vg(prm, X, t):
        v_of_x = lambda x: s.V_net.apply(prm["V"], x)[:, 0]
        V, pull = jax.vjp(v_of_x, X)
        (gradX,) = pull(jnp.ones_like(V))
        return V, sig.apply_T(gradX)

    def loss_scan(prm):
        sh = _LambdaShiftedProblem(p, s.lam(prm))
        v_fn = lambda X: s.V_net.apply(prm["V"], X)[:, 0]
        o = stopped_rollout(cfg, sh, vg, prm, X0, zeros, zeros, key, ins,
                            v_ref=p.v_ref)
        return jnp.mean((v_fn(o.X) - v_fn(X0) - o.Y) ** 2)

    treedef = jax.tree.structure(s.params)

    def loss_fused(lv):
        prm = jax.tree.unflatten(treedef, list(lv))
        v_fn = lambda X: s.V_net.apply(prm["V"], X)[:, 0]
        o = run(lv, X0.T, zeros, jnp.float32(0))
        return jnp.mean((v_fn(o.XT.T) - v_fn(X0) - o.Y) ** 2)

    leaves = tuple(jax.tree.leaves(s.params))
    np.testing.assert_allclose(float(loss_scan(s.params)),
                               float(loss_fused(leaves)), rtol=2e-4)
    g1 = jax.tree.leaves(jax.grad(loss_scan)(s.params))
    g2 = jax.grad(loss_fused)(leaves)
    # dict order {'V', 'lam'}: the lam leaf is last in both flattenings
    assert abs(float(jnp.ravel(g2[-1])[0])) > 0.0
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-6)


def test_solver_fused_mode_falls_back_off_tpu():
    """rollout_mode='fused_train' on a non-TPU backend: one warning,
    resolved_rollout_mode records the scan, training runs."""
    from pspde.problems import FokkerPlanckEigen
    from pspde.solvers import EigenSolver, EllipticSolver, GeneralSolver
    kw = dict(L=2, K=32, K_boundary=16, N=4, delta_t=0.01, verbose=False,
              rollout_mode="fused_train")
    with pytest.warns(UserWarning, match="fell back to 'scan'"):
        s = EllipticSolver(ExponentialOnSphere(d=3, alpha=0.5), "fb-ell",
                           loss_method="diffusion", **kw)
        s.train()
    assert s.resolved_rollout_mode == "scan"
    assert np.isfinite(s.loss_log[-1])
    with pytest.warns(UserWarning, match="fell back to 'scan'"):
        g = GeneralSolver(ExponentialOnSphereNonlinearParabolic(d=3),
                          "fb-gen", loss_method="diffusion", **kw)
        g.train()
    assert g.resolved_rollout_mode == "scan"
    with pytest.warns(UserWarning, match="fell back to 'scan'"):
        e = EigenSolver(FokkerPlanckEigen(d=2), "fb-eig", **kw)
        e.train()
    assert e.resolved_rollout_mode == "scan"


def test_resolve_fused_probe_runs_on_all_solvers(monkeypatch):
    """The transposed-apply capability probe inside _resolve_fused must
    be reachable on every stopped-family solver: round 5 found
    GeneralSolver missing the _probe_params alias, which crashed
    fused_train with AttributeError ONLY on a real TPU (off-TPU the
    backend gate short-circuits before the probe).  Fake the backend so
    the probe executes here (eval_shape is backend-independent)."""
    from pspde.problems import FokkerPlanckEigen
    from pspde.solvers import EigenSolver, EllipticSolver, GeneralSolver
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    kw = dict(L=1, K=32, K_boundary=16, N=4, delta_t=0.01, verbose=False,
              rollout_mode="fused_train")
    e = EllipticSolver(ExponentialOnSphere(d=3, alpha=0.5), "pr-ell",
                       loss_method="diffusion", **kw)
    assert e._resolve_fused()
    g = GeneralSolver(ExponentialOnSphereNonlinearParabolic(d=3),
                      "pr-gen", loss_method="diffusion", **kw)
    assert g._resolve_fused()
    ei = EigenSolver(FokkerPlanckEigen(d=2), "pr-eig", **kw)
    assert ei._resolve_fused()
