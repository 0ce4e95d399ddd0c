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
