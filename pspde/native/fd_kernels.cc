// Native FD-oracle kernels for the path-space PDE solver.
//
// The reference computes its double-well ground-truth solutions by a
// per-time-step banded solve in SciPy (problems.py:257-262: N implicit
// Euler steps, each refactorizing the same tridiagonal matrix) and its
// first-exit oracles by a dense LU of the full generator
// (problems.py:1279).  These run on the host once per problem; here they
// are C++ with the factorization hoisted out of the time loop:
//
//  * thomas_factor / thomas_solve_many: LU factorization of a (possibly
//    non-symmetric) tridiagonal system, factored ONCE and reused for all
//    N backward-Euler steps (the reference refactorizes every step).
//  * backward_euler_sweep: the full psi time-marching loop
//    psi_n = D (I - dt A)^{-1} D^{-1} psi_{n+1} in one native call,
//    avoiding N Python-loop iterations.
//
// Built as a shared library (no Python headers needed); bound via ctypes
// in fd_native.py with a SciPy fallback when the library is missing.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Factor the tridiagonal matrix with diagonals (lower[0..n-2], diag[0..n-1],
// upper[0..n-2]) into the Thomas-algorithm form.  Outputs: cp (modified
// upper coefficients) and the pivots (modified diagonal).  Returns 0 on
// success, -1 on a zero pivot.
int thomas_factor(const double* lower, const double* diag,
                  const double* upper, int64_t n, double* cp,
                  double* pivot) {
  if (n <= 0) return -1;
  pivot[0] = diag[0];
  if (pivot[0] == 0.0) return -1;
  for (int64_t i = 0; i + 1 < n; ++i) {
    cp[i] = upper[i] / pivot[i];
    pivot[i + 1] = diag[i + 1] - lower[i] * cp[i];
    if (pivot[i + 1] == 0.0) return -1;
  }
  return 0;
}

// Solve T x = b for nrhs right-hand sides (row-major (nrhs, n)) using a
// precomputed factorization.  In-place on b.
void thomas_solve_many(const double* lower, const double* cp,
                       const double* pivot, int64_t n, double* b,
                       int64_t nrhs) {
  for (int64_t r = 0; r < nrhs; ++r) {
    double* x = b + r * n;
    x[0] = x[0] / pivot[0];
    for (int64_t i = 1; i < n; ++i)
      x[i] = (x[i] - lower[i - 1] * x[i - 1]) / pivot[i];
    for (int64_t i = n - 2; i >= 0; --i) x[i] -= cp[i] * x[i + 1];
  }
}

// Full backward-Euler sweep for the log-transformed 1-d parabolic oracle:
//   psi[N] given; psi[n] = D * T^{-1} (Dinv * psi[n+1]),  n = N-1..0
// where T = I - dt*A is tridiagonal with sub/super diagonal ``off`` and
// main diagonal ``diag`` (already including the I - dt scaling), and
// D/Dinv are the symmetrization diagonals.  psi is (N+1, n) row-major
// with row N filled in by the caller.  Returns 0 on success.
int backward_euler_sweep(const double* off_scaled,   // (n-1): -dt*off
                         const double* diag_scaled,  // (n):   1-dt*diag
                         const double* D, const double* Dinv, int64_t n,
                         double* psi, int64_t n_steps) {
  std::vector<double> cp(n - 1), pivot(n), rhs(n);
  if (thomas_factor(off_scaled, diag_scaled, off_scaled, n, cp.data(),
                    pivot.data()) != 0)
    return -1;
  for (int64_t step = n_steps - 1; step >= 0; --step) {
    const double* next = psi + (step + 1) * n;
    double* cur = psi + step * n;
    for (int64_t i = 0; i < n; ++i) rhs[i] = Dinv[i] * next[i];
    thomas_solve_many(off_scaled, cp.data(), pivot.data(), n, rhs.data(), 1);
    for (int64_t i = 0; i < n; ++i) cur[i] = D[i] * rhs[i];
  }
  return 0;
}

// Dense Gaussian elimination with partial pivoting for the stationary
// first-exit generator solves (Nx ~ 400; problems.py:1279 uses
// np.linalg.solve).  A is (n, n) row-major (destroyed), b is (n,)
// (replaced by the solution).  Returns 0 on success.
int dense_solve(double* A, double* b, int64_t n) {
  std::vector<int64_t> piv(n);
  for (int64_t k = 0; k < n; ++k) {
    int64_t p = k;
    double best = A[k * n + k] < 0 ? -A[k * n + k] : A[k * n + k];
    for (int64_t i = k + 1; i < n; ++i) {
      double v = A[i * n + k] < 0 ? -A[i * n + k] : A[i * n + k];
      if (v > best) { best = v; p = i; }
    }
    if (best == 0.0) return -1;
    if (p != k) {
      for (int64_t j = 0; j < n; ++j) std::swap(A[k * n + j], A[p * n + j]);
      std::swap(b[k], b[p]);
    }
    const double inv = 1.0 / A[k * n + k];
    for (int64_t i = k + 1; i < n; ++i) {
      const double f = A[i * n + k] * inv;
      if (f == 0.0) continue;
      for (int64_t j = k; j < n; ++j) A[i * n + j] -= f * A[k * n + j];
      b[i] -= f * b[k];
    }
  }
  for (int64_t i = n - 1; i >= 0; --i) {
    double s = b[i];
    for (int64_t j = i + 1; j < n; ++j) s -= A[i * n + j] * b[j];
    b[i] = s / A[i * n + i];
  }
  return 0;
}

}  // extern "C"
