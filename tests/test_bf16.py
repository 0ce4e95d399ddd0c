"""Mixed-precision rollout: bf16 path state + net compute, f32
accumulators (VERDICT round-1 item 5).  The noise stream is f32 and
identical across dtypes, so a bf16 run must track the f32 run within
bf16 rounding accumulation."""

import jax
import jax.numpy as jnp
import numpy as np

from pspde.problems import LLGC
from pspde.solvers import HJBSolver


def _solver(dtype, **kw):
    p = LLGC(d=8, T=1.0)
    return HJBSolver("b", p, lr=1e-2, L=30, K=256, delta_t=1.0 / 16,
                     time_approx="inner", loss_method="log-variance",
                     learn_Y_0=True, detach_forward=True, verbose=False,
                     early_stopping_time=None, dtype=dtype, **kw)


def test_bf16_accumulators_stay_f32():
    s = _solver(jnp.bfloat16)
    from pspde.rollout.sde import hjb_rollout
    control_fn = s._control_fn()
    y_init = s._y_init_fn()
    cfg = s._rollout_cfg(0)
    X0 = jnp.zeros((s.K, s.d), dtype=jnp.bfloat16)
    out = hjb_rollout(cfg, s.problem, control_fn, s.params, X0,
                      y_init(s.params, X0), jax.random.PRNGKey(0),
                      u_ref=s._u_ref)
    assert out.X.dtype == jnp.bfloat16
    assert out.Y.dtype == jnp.float32
    assert out.Z_sum.dtype == jnp.float32
    assert out.u_l2.dtype == jnp.float32


def test_bf16_training_tracks_f32():
    s32 = _solver(jnp.float32)
    s32.train()
    s16 = _solver(jnp.bfloat16)
    s16.train()
    # same noise keys; only state/net rounding differs.  Both must
    # converge to the same place: compare the last-5-iter averages.
    l32 = np.mean(s32.u_L2_loss[-5:])
    l16 = np.mean(s16.u_L2_loss[-5:])
    assert np.isfinite(l16)
    assert abs(l16 - l32) / l32 < 0.15, (l16, l32)
    # early iterations nearly identical (rounding hasn't accumulated)
    np.testing.assert_allclose(s32.loss_log[0], s16.loss_log[0], rtol=0.05)
