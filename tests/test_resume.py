"""Full training resume (VERDICT round-1 item 7): a save at iteration k
followed by load + train must produce the identical trajectory to the
uninterrupted run — params, Adam moments, noise stream, and logs all
continue.  Plus initialize_multihost error-path hardening (item 8)."""

import numpy as np
import pytest

import pspde.parallel.mesh as mesh_mod
from pspde.parallel import initialize_multihost
from pspde.problems import (ExponentialOnSphere, FokkerPlanckEigen,
                            HeatEquation, LLGC)
from pspde.solvers import (EigenSolver, EllipticSolver, GeneralSolver,
                           HJBSolver)


def _pairs():
    def hjb(L, **kw):
        return HJBSolver("h", LLGC(d=3, T=0.5), lr=1e-2, L=L, K=64,
                         delta_t=0.1, time_approx="inner",
                         loss_method="log-variance", learn_Y_0=True,
                         verbose=False, early_stopping_time=None, **kw)

    def ell(L, **kw):
        return EllipticSolver(ExponentialOnSphere(d=3), "e", L=L, K=64,
                              K_boundary=16, N=6, delta_t=1e-2,
                              verbose=False, K_test_log=64, **kw)

    def gen(L, **kw):
        return GeneralSolver(HeatEquation(d=3), "g", L=L, K=64,
                             K_boundary=16, N=6, delta_t=1e-2,
                             verbose=False, **kw)

    def eig(L, **kw):
        return EigenSolver(FokkerPlanckEigen(d=2), "f", L=L, K=64,
                           K_boundary=16, N=5, verbose=False, **kw)

    return [("hjb", hjb), ("elliptic", ell), ("general", gen),
            ("eigen", eig)]


@pytest.mark.parametrize("name,make", _pairs())
def test_save_resume_matches_uninterrupted(tmp_path, name, make):
    ref = make(16)
    ref.train()

    s = make(8)
    s.train()
    path = s.save_training_state(out_dir=str(tmp_path))

    s2 = make(16)
    s2.load_training_state(path)
    assert s2.step == 8 and len(s2.loss_log) == 8
    s2.train()

    np.testing.assert_allclose(ref.loss_log, s2.loss_log, rtol=1e-5)
    np.testing.assert_allclose(
        np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree.leaves(ref.params)]),
        np.concatenate([np.ravel(x) for x in
                        __import__("jax").tree.leaves(s2.params)]),
        rtol=1e-5, atol=1e-7)


def test_resume_with_chunked_steps(tmp_path):
    ref = EllipticSolver(ExponentialOnSphere(d=3), "e", L=16, K=64,
                         K_boundary=16, N=6, delta_t=1e-2, verbose=False)
    ref.train()
    s = EllipticSolver(ExponentialOnSphere(d=3), "e", L=6, K=64,
                       K_boundary=16, N=6, delta_t=1e-2, verbose=False)
    s.train()
    path = s.save_training_state(out_dir=str(tmp_path))
    s2 = EllipticSolver(ExponentialOnSphere(d=3), "e", L=16, K=64,
                        K_boundary=16, N=6, delta_t=1e-2, verbose=False,
                        steps_per_call=4)  # resume offset 6 not chunk-aligned
    s2.load_training_state(path)
    s2.train()
    assert len(s2.loss_log) == 16
    np.testing.assert_allclose(ref.loss_log, s2.loss_log, rtol=1e-5)


# -- initialize_multihost error paths -----------------------------------------

def test_multihost_swallows_only_double_init(monkeypatch):
    def already(**kw):
        raise RuntimeError("distributed.initialize should only be called "
                           "once.")
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", already)
    initialize_multihost()  # benign, no raise

    def broken(**kw):
        raise RuntimeError("failed to connect to coordinator")
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", broken)
    with pytest.raises(RuntimeError, match="coordinator"):
        initialize_multihost()

    def bad_args(**kw):
        raise ValueError("coordinator_address should be defined.")
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize", bad_args)
    with pytest.raises(ValueError):
        initialize_multihost(num_processes=2, process_id=0)


def test_resume_with_rbg_rng_impl(tmp_path):
    """rng_impl='rbg' (typed PRNG key) survives the checkpoint round-trip
    and reproduces the uninterrupted trajectory."""
    def make(L):
        return HJBSolver("hrbg", LLGC(d=3, T=0.5), lr=1e-2, L=L, K=64,
                         delta_t=0.1, time_approx="inner",
                         loss_method="log-variance", learn_Y_0=True,
                         verbose=False, early_stopping_time=None,
                         rng_impl="rbg")

    ref = make(12)
    ref.train()
    a = make(12)
    a.L = 6
    a.train()
    path = a.save_training_state(out_dir=str(tmp_path))
    b = make(12)
    b.load_training_state(path)
    b.train()
    np.testing.assert_allclose(np.asarray(b.loss_log),
                               np.asarray(ref.loss_log), rtol=1e-5)
