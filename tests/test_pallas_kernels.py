"""Pallas fused-rollout kernel tests (interpret mode on CPU, identical
host noise => exact agreement with the lax.scan reference path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pspde.problems import LLGC, DoubleWell
from pspde.rollout.kernels import (fused_controlled_rollout,
                                   reference_controlled_rollout)


def _linear_control(d, key):
    W = 0.1 * jax.random.normal(key, (d + 1, d))

    def u_apply(params, tX):
        return jnp.dot(tX, params[0], preferred_element_type=jnp.float32)

    return u_apply, (W,)


@pytest.mark.parametrize("off_diag", [0.0, 0.1])
def test_fused_matches_scan_exactly(key, off_diag):
    d, K, N, dt = 4, 1024, 40, 0.02
    p = LLGC(d=d, T=1.0, off_diag=off_diag)
    u_apply, leaves = _linear_control(d, key)
    noise = jax.random.normal(jax.random.fold_in(key, 1), (N, K, d))
    out = fused_controlled_rollout(p, u_apply, leaves, K, N, dt, seed=3,
                                   tile=512, interpret=True,
                                   host_noise=noise)
    ref = reference_controlled_rollout(p, u_apply, leaves, K, N, dt, key,
                                       host_noise=noise)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.ito), np.asarray(ref.ito),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.riemann),
                               np.asarray(ref.riemann), atol=2e-5)


def test_fused_nonlinear_drift(key):
    """Double-well drift (cubic, closed-over scalars) traces into the
    kernel correctly."""
    p = DoubleWell(d=1, T=0.5, eta=1.0, kappa=2.0)
    u_apply, leaves = _linear_control(1, key)
    K, N, dt = 512, 25, 0.02
    noise = jax.random.normal(jax.random.fold_in(key, 2), (N, K, 1))
    out = fused_controlled_rollout(p, u_apply, leaves, K, N, dt, seed=1,
                                   tile=256, interpret=True,
                                   host_noise=noise)
    ref = reference_controlled_rollout(p, u_apply, leaves, K, N, dt, key,
                                       host_noise=noise)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               atol=2e-5)


def test_fused_nondivisible_K(key):
    """K not a multiple of the tile: padded grid, truncated outputs."""
    p = LLGC(d=2, T=0.5)
    u_apply, leaves = _linear_control(2, key)
    K, N, dt = 700, 10, 0.05
    noise = jax.random.normal(key, (N, K, 2))
    out = fused_controlled_rollout(p, u_apply, leaves, K, N, dt, seed=1,
                                   tile=512, interpret=True,
                                   host_noise=noise)
    assert out.X.shape == (700, 2)
    ref = reference_controlled_rollout(p, u_apply, leaves, K, N, dt, key,
                                       host_noise=noise)
    np.testing.assert_allclose(np.asarray(out.X[:512]),
                               np.asarray(ref.X[:512]), atol=2e-5)


def test_fused_is_wrapper(key):
    from pspde.eval import importance_sampling_fused
    from pspde.solvers import HJBSolver
    p = LLGC(d=2, T=0.5)
    s = HJBSolver("f", p, L=1, K=32, delta_t=0.05, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    # interpret mode needs host noise for the TPU PRNG; patch via kernel
    import importlib
    isamp = importlib.import_module("pspde.eval.importance_sampling")
    from pspde.rollout import kernels as kmod
    orig = kmod.fused_controlled_rollout

    def patched(problem, u_apply, leaves, K, N, dt, seed, **kw):
        noise = jax.random.normal(jax.random.PRNGKey(seed), (N, K, problem.d))
        kw.update(interpret=True, host_noise=noise)
        return orig(problem, u_apply, leaves, K, N, dt, seed, **kw)

    kmod.fused_controlled_rollout = patched
    try:
        mean, var, rel = isamp.importance_sampling_fused(
            p, s, K=4096, delta_t=0.05, seed=0, tile=2048)
    finally:
        kmod.fused_controlled_rollout = orig
    # sanity: matches the plain scan-based IS estimate
    mean2, var2, rel2 = isamp.importance_sampling(
        p, s, K=4096, delta_t=0.05, key=key)
    np.testing.assert_allclose(mean, mean2, rtol=0.1)


def test_vmem_guardrail_autoshrinks_tile(key):
    """A noise block too big for the budget shrinks the tile (result
    identical, grid just has more programs)."""
    p = LLGC(d=2, T=0.5)
    u_apply, leaves = _linear_control(2, key)
    K, N, dt = 1024, 10, 0.05
    noise = jax.random.normal(key, (N, K, 2))
    out = fused_controlled_rollout(p, u_apply, leaves, K, N, dt, seed=1,
                                   tile=1024, interpret=True,
                                   host_noise=noise,
                                   vmem_budget_bytes=2 * 2**20)
    ref = reference_controlled_rollout(p, u_apply, leaves, K, N, dt, key,
                                       host_noise=noise)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               atol=2e-5)


def test_vmem_guardrail_raises_on_oversized_weights(key):
    p = LLGC(d=2, T=0.5)
    W = jnp.zeros((4096, 4096))  # 64 MiB of weights

    def u_apply(params, tX):
        return tX[:, 1:] + params[0][0, 0]

    with pytest.raises(ValueError, match="VMEM"):
        fused_controlled_rollout(p, u_apply, (W,), 64, 4, 0.05, seed=0,
                                 interpret=True,
                                 vmem_budget_bytes=8 * 2**20)


def test_fused_noise_sign_mirrors_exactly(key):
    """noise_sign=-1 with the same host noise == the scan reference run
    on the NEGATED noise block (the antithetic pairing primitive)."""
    p = LLGC(d=3, T=0.5)
    u_apply, leaves = _linear_control(3, key)
    K, N, dt = 256, 12, 0.04
    noise = jax.random.normal(jax.random.fold_in(key, 7), (N, K, 3))
    out = fused_controlled_rollout(p, u_apply, leaves, K, N, dt, seed=2,
                                   tile=256, interpret=True,
                                   host_noise=noise, noise_sign=-1.0)
    ref = reference_controlled_rollout(p, u_apply, leaves, K, N, dt, key,
                                       host_noise=-noise)
    np.testing.assert_allclose(np.asarray(out.X), np.asarray(ref.X),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(out.ito), np.asarray(ref.ito),
                               atol=2e-5)


def test_fused_is_antithetic(key):
    """importance_sampling_fused(antithetic=True): mean consistent with
    the plain fused estimate; even-K guard raises."""
    from pspde.solvers import HJBSolver
    import importlib
    isamp = importlib.import_module("pspde.eval.importance_sampling")
    from pspde.rollout import kernels as kmod
    p = LLGC(d=2, T=0.5)
    s = HJBSolver("fa", p, L=1, K=32, delta_t=0.05, time_approx="inner",
                  verbose=False, early_stopping_time=None)
    orig = kmod.fused_controlled_rollout

    def patched(problem, u_apply, leaves, K, N, dt, seed, **kw):
        noise = jax.random.normal(jax.random.PRNGKey(seed), (N, K, problem.d))
        kw.update(interpret=True, host_noise=noise)
        return orig(problem, u_apply, leaves, K, N, dt, seed, **kw)

    kmod.fused_controlled_rollout = patched
    try:
        m_a, v_a, r_a = isamp.importance_sampling_fused(
            p, s, K=4096, delta_t=0.05, seed=0, tile=2048, antithetic=True)
        m_p, v_p, r_p = isamp.importance_sampling_fused(
            p, s, K=4096, delta_t=0.05, seed=0, tile=2048)
    finally:
        kmod.fused_controlled_rollout = orig
    np.testing.assert_allclose(m_a, m_p, rtol=0.1)
    assert np.isfinite(r_a) and r_a > 0
    with pytest.raises(ValueError, match="even K"):
        isamp.importance_sampling_fused(p, s, K=999, antithetic=True)


def test_binom_noise_moments_numpy_mirror():
    """The rng='binom' moment-matched noise map (kernels.py:
    _normals_from_bits_binom) replicated in numpy on uniform bits:
    exact mean/variance/skewness, excess kurtosis -1/16/(8+1/12)^2 *
    ... ~ -0.061, |z| <= 5.8 sigma, continuous after the dither.  (The
    Pallas lowering itself was validated on-chip: measured moments
    [5e-4, 0.9996, 0.0, 2.9385] — the interpret backend lacks the TPU
    PRNG primitives, so this mirrors the arithmetic.)"""
    import numpy as np

    rng = np.random.default_rng(7)
    b1 = rng.integers(0, 2 ** 32, size=2 ** 22, dtype=np.uint32)
    b2 = rng.integers(0, 2 ** 32, size=2 ** 22, dtype=np.uint32)
    pc = np.bitwise_count(b1).astype(np.float32)
    u = (b2 & np.uint32(0x7FFF)).astype(np.float32) * np.float32(2.0**-15)
    scale = np.float32(1.0 / np.sqrt(8.0 + 1.0 / 12.0))
    z = ((pc - 16.0) + u - 0.5) * scale
    assert abs(z.mean()) < 2e-3
    np.testing.assert_allclose(z.var(), 1.0, atol=2e-3)
    assert abs((z ** 3).mean()) < 5e-3
    kurt = (z ** 4).mean() / z.var() ** 2
    np.testing.assert_allclose(kurt, 2.938, atol=0.01)
    assert abs(z).max() <= 16.5 * scale + 1e-6
