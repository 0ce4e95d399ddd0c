"""Native C++ FD-kernel tests: build, correctness vs SciPy/NumPy."""

import numpy as np
import pytest

from pspde.native import fd_native


@pytest.fixture(scope="module")
def lib():
    fd_native.build()
    assert fd_native.available()
    return fd_native


def test_backward_euler_sweep_matches_scipy(lib):
    from scipy.linalg import solve_banded
    rng = np.random.default_rng(0)
    n, N = 200, 30
    off = -np.abs(rng.standard_normal(n - 1)) * 0.1
    diag = 1.0 + np.abs(rng.standard_normal(n))
    D = np.exp(rng.standard_normal(n) * 0.1)
    psi_T = np.abs(rng.standard_normal(n)) + 0.5
    got = lib.backward_euler_sweep(off, diag, D, 1.0 / D, psi_T, N)
    ab = np.zeros((3, n))
    ab[0, 1:] = off
    ab[1] = diag
    ab[2, :-1] = off
    want = np.zeros((N + 1, n))
    want[N] = psi_T
    for k in range(N - 1, -1, -1):
        want[k] = D * solve_banded((1, 1), ab, (1.0 / D) * want[k + 1])
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


def test_dense_solve_matches_numpy(lib):
    rng = np.random.default_rng(1)
    n = 150
    A = rng.standard_normal((n, n)) + n * np.eye(n)
    b = rng.standard_normal(n)
    got = lib.dense_solve(A, b)
    np.testing.assert_allclose(got, np.linalg.solve(A, b), rtol=1e-9)


def test_fd_oracle_uses_native_and_matches(lib):
    """The double-well oracle gives identical tables with and without the
    native path."""
    from pspde.problems import DoubleWell
    import pspde.problems.fd_oracles as fo

    dw1 = DoubleWell(d=1, T=0.5, eta=1.0, kappa=2.0)
    dw1.compute_reference_solution(delta_t=0.01, nx=300)

    # force the scipy fallback by hiding the native module
    import pspde.native.fd_native as nat
    orig = nat.available
    nat.available = lambda: False
    try:
        dw2 = DoubleWell(d=1, T=0.5, eta=1.0, kappa=2.0)
        dw2.compute_reference_solution(delta_t=0.01, nx=300)
    finally:
        nat.available = orig
    np.testing.assert_allclose(dw1._psi_np, dw2._psi_np, rtol=1e-8)
    np.testing.assert_allclose(dw1._u_np, dw2._u_np, rtol=1e-6, atol=1e-9)
