"""Test-error computation on fresh in-domain samples
(rebuilds compute_test_error, utilities.py:440-472)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rollout.sampling import sample_domain


def compute_test_error(v_fn, problem, K: int, key, modus: str = "elliptic"):
    """Returns (L2_error, mean_absolute_error, mean_relative_error) of the
    value approximation against problem.v_ref on a fresh uniform sample.

    ``modus='parabolic'`` appends t ~ U(0, T) to the net input and
    evaluates the reference at (x, t) (utilities.py:456-464).
    """
    kx, kt = jax.random.split(key)
    X = sample_domain(kx, problem.geometry, K, problem.d)
    if modus == "parabolic":
        t = jax.random.uniform(kt, (K,)) * problem.T
        v_true = problem.v_ref(X, t)
        v_est = v_fn(jnp.concatenate([X, t[:, None]], axis=-1))
    else:
        v_true = problem.v_ref(X)
        v_est = v_fn(X)
    diff = v_true - v_est
    L2 = jnp.mean(diff ** 2)
    mae = jnp.mean(jnp.abs(diff))
    mre = jnp.mean(jnp.abs(diff) / v_true)
    return L2, mae, mre
