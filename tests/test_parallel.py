"""Mesh/sharding tests on the 8-device virtual CPU platform."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pspde.parallel import (batch_sharding, make_mesh, shard_batch,
                            shard_params_tp)
from pspde.problems import LLGC
from pspde.solvers import HJBSolver


def test_make_mesh_shapes():
    mesh = make_mesh(n_dp=4, n_tp=2)
    assert mesh.shape == {"dp": 4, "tp": 2}
    mesh2 = make_mesh(n_tp=2)   # auto dp
    assert mesh2.shape["dp"] * 2 <= 8 + 1


def test_shard_batch_places_on_dp():
    mesh = make_mesh(n_dp=8)
    x = jnp.zeros((64, 3))
    y = shard_batch(x, mesh)
    assert y.sharding.is_equivalent_to(batch_sharding(mesh, 2), 2)


def test_shard_params_tp_column_shards_kernels():
    mesh = make_mesh(n_dp=4, n_tp=2)
    p = LLGC(d=4, T=0.5)
    s = HJBSolver("tp", p, L=1, K=32, delta_t=0.1, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    sharded = shard_params_tp(s.params, mesh)
    flat = jax.tree.flatten_with_path(sharded)[0]
    kernels = [(k, v) for k, v in flat if "kernel" in str(k)]
    # hidden-width-30 kernels divide tp=2 -> sharded on last axis
    assert any("tp" in str(v.sharding.spec) for _, v in kernels)


def test_tp_sharded_step_matches_replicated():
    """Full training step with tp-sharded kernels == replicated params."""
    mesh = make_mesh(n_dp=4, n_tp=2)
    kw = dict(lr=1e-2, L=8, K=64, delta_t=0.1, time_approx="inner",
              learn_Y_0=True, verbose=False, early_stopping_time=None)
    s1 = HJBSolver("a", LLGC(d=4, T=0.5), **kw)
    s1.train()

    s2 = HJBSolver("b", LLGC(d=4, T=0.5), mesh=mesh, **kw)
    s2.params = shard_params_tp(s2.params, mesh)
    s2.opt_state = s2.tx.init(s2.params)
    s2.train()
    np.testing.assert_allclose(s1.loss_log, s2.loss_log, rtol=1e-3,
                               atol=1e-5)
