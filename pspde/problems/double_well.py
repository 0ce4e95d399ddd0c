"""Double-well metastability problems with FD oracles.

Rebuilds:
  * ``DoubleWell``                     — problems.py:178-282
  * ``DoubleWell_multidim``            — problems.py:285-476
  * ``DoubleWellGeneral``              — problems.py:479-688
                                         (``DoubleWell_multidim_for_general_solver``)
  * ``DoubleWell_multidim_2``          — problems.py:691-727 (radial)
  * ``DoubleWell_multidim_3``          — problems.py:730-840 (isotropic product)
  * ``DoubleWell_OU``                  — problems.py:843-959
  * ``DoubleWell_stopping``            — problems.py:1220-1309
  * ``DoubleWell_stopping_linear``     — problems.py:1312-1401
  * ``DoubleWell_expectation_hitting_time`` — problems.py:1404-1496
  * ``Committor_DoubleWell``           — problems.py:1499-1543

Reference solutions come from :mod:`pspde.problems.fd_oracles`; lookup
tables are device arrays and lookups are gathers
(u_ref_fn / v_ref_fn closures), so the training loop never leaves device.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .base import DiffusionMatrix, Geometry, Problem
from .fd_oracles import (elliptic_generator_reference,
                         parabolic_log_transform_reference)


def _t_to_index(ts: np.ndarray, delta_t: float, nmax: int) -> np.ndarray:
    return np.minimum(np.ceil(np.asarray(ts) / delta_t - 1e-9).astype(int),
                      nmax)


class _TableLookup1D:
    """Gathers a per-time 1-d table at clipped grid indices (device-side).

    Replaces the reference's floor-index lookups (problems.py:271-282)
    including the clip to the valid control range.
    """

    def __init__(self, table: np.ndarray, xb: float, dx: float):
        self.table = jnp.asarray(table, dtype=jnp.float32)  # (n_times, nx_t)
        self.xb = float(xb)
        self.dx = float(dx)
        self.nmax = table.shape[1] - 1

    def __call__(self, x1d: jnp.ndarray, i) -> jnp.ndarray:
        idx = jnp.clip(jnp.floor((x1d + self.xb) / self.dx).astype(jnp.int32),
                       0, self.nmax)
        return jnp.take(self.table[i], idx)


class DoubleWell(Problem):
    """1-d double-well potential kappa (x^2-1)^2, terminal cost eta (x-1)^2.

    HJB with h = -1/2 |z|^2 (problems.py:178-214); FD oracle via the
    log-transformed linear backward PDE (problems.py:216-269).
    """

    h_is_y_free = True

    def __init__(self, name="Double well", d=1, T=1.0, eta=1.0, kappa=1.0):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.eta = float(eta)
        self.kappa = float(kappa)
        self.B = jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = -jnp.ones((d,), dtype=jnp.float32)
        self.ref_sol_is_defined = False
        if d != 1:
            print("The double well example is only implemented for d = 1.")

    @property
    def sigma_struct(self):
        return self._sigma

    def V(self, x):
        return self.kappa * (x ** 2 - 1.0) ** 2

    def grad_V(self, x):
        return 4.0 * self.kappa * x * (x ** 2 - 1.0)

    def b(self, x):
        return -self.grad_V(x)

    def f(self, x, t):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, t, x, y, z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    def g(self, x):
        return jnp.squeeze(self.eta * (x - 1.0) ** 2, axis=-1)

    # -- FD oracle ---------------------------------------------------------
    def compute_reference_solution(self, delta_t=0.005, xb=2.5, nx=1000):
        Vnp = lambda x: self.kappa * (x ** 2 - 1.0) ** 2
        gnp = lambda x: self.eta * (x - 1.0) ** 2
        xvec, psi, u, dx = parabolic_log_transform_reference(
            Vnp, gnp, self.T, delta_t=delta_t, xb=xb, nx=nx, B00=1.0)
        self.ref_delta_t, self.xb, self.dx = delta_t, xb, dx
        self._psi_np, self._u_np, self.xvec = psi, u, xvec
        self.ref_sol_is_defined = True

    def u_ref_fn(self, ts: np.ndarray):
        assert self.ref_sol_is_defined
        idx = _t_to_index(ts, self.ref_delta_t, self._u_np.shape[0] - 1)
        lut = _TableLookup1D(self._u_np[idx], self.xb, self.dx)

        def u_ref(x, i):
            return lut(x[:, 0], i)[:, None]

        return u_ref

    def v_ref_fn(self, ts: np.ndarray):
        assert self.ref_sol_is_defined
        idx = _t_to_index(ts, self.ref_delta_t, self._psi_np.shape[0] - 1)
        lut = _TableLookup1D(-np.log(np.maximum(self._psi_np[idx], 1e-300)),
                             self.xb, self.dx)

        def v_ref(x, i):
            return lut(x[:, 0], i)

        return v_ref


class DoubleWell_multidim(Problem):
    """Product of 1-d double wells: dims 0..d_1-1 carry (eta, kappa), dims
    d_1..d-1 carry (1, 1) — mixed metastabilities (problems.py:285-476)."""

    h_is_y_free = True

    def __init__(self, name="Double well", d=1, d_1=1, d_2=0, T=1.0, eta=1.0,
                 kappa=1.0):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.d_1, self.d_2 = d_1, d_2
        self.eta, self.kappa = float(eta), float(kappa)
        self.eta_ = jnp.asarray([eta] * d_1 + [1.0] * d_2, dtype=jnp.float32)
        self.kappa_ = jnp.asarray([kappa] * d_1 + [1.0] * d_2,
                                  dtype=jnp.float32)
        self.B = jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = -jnp.ones((d,), dtype=jnp.float32)
        self.geometry = Geometry(kind="unbounded", boundary_distance=2.0)
        self.ref_sol_is_defined = False

    @property
    def sigma_struct(self):
        return self._sigma

    def grad_V(self, x):
        return 4.0 * self.kappa_ * x * (x ** 2 - 1.0)

    def b(self, x):
        return -self.grad_V(x)

    def f(self, x, t):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, t, x, y, z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    def g(self, x):
        return jnp.sum(self.eta_ * (x - 1.0) ** 2, axis=-1)

    def compute_reference_solution(self, delta_t=0.005, xb=2.5, nx=1000):
        """Two 1-d FD solves: (eta, kappa) wells and unit wells
        (problems.py:336-390 and :407-461)."""
        self.ref_delta_t, self.xb = delta_t, xb
        _, psi1, u1, dx = parabolic_log_transform_reference(
            lambda x: self.kappa * (x ** 2 - 1.0) ** 2,
            lambda x: self.eta * (x - 1.0) ** 2,
            self.T, delta_t=delta_t, xb=xb, nx=nx, B00=1.0)
        _, psi2, u2, _ = parabolic_log_transform_reference(
            lambda x: (x ** 2 - 1.0) ** 2,
            lambda x: (x - 1.0) ** 2,
            self.T, delta_t=delta_t, xb=xb, nx=nx, B00=1.0)
        self.dx = dx
        self._psi1, self._u1 = psi1, u1
        self._psi2, self._u2 = psi2, u2
        self.ref_sol_is_defined = True

    def u_ref_fn(self, ts: np.ndarray):
        """Concatenates per-dimension 1-d controls (problems.py:475-476)."""
        assert self.ref_sol_is_defined
        idx = _t_to_index(ts, self.ref_delta_t, self._u1.shape[0] - 1)
        lut1 = _TableLookup1D(self._u1[idx], self.xb, self.dx)
        lut2 = _TableLookup1D(self._u2[idx], self.xb, self.dx)
        d_1 = self.d_1

        def u_ref(x, i):
            u_a = lut1(x[:, :d_1], i) if d_1 > 0 else x[:, :0]
            u_b = lut2(x[:, d_1:], i) if d_1 < x.shape[1] else x[:, :0]
            return jnp.concatenate([u_a, u_b], axis=-1)

        return u_ref

    def v_ref_fn(self, ts: np.ndarray):
        """Sum of per-dimension 1-d values -log psi (problems.py:392-396)."""
        assert self.ref_sol_is_defined
        idx = _t_to_index(ts, self.ref_delta_t, self._psi1.shape[0] - 1)
        neglog = lambda p: -np.log(np.maximum(p, 1e-300))
        lut1 = _TableLookup1D(neglog(self._psi1[idx]), self.xb, self.dx)
        lut2 = _TableLookup1D(neglog(self._psi2[idx]), self.xb, self.dx)
        d_1 = self.d_1

        def v_ref(x, i):
            v = jnp.zeros(x.shape[0], dtype=x.dtype)
            if d_1 > 0:
                v = v + jnp.sum(lut1(x[:, :d_1], i), axis=-1)
            if d_1 < x.shape[1]:
                v = v + jnp.sum(lut2(x[:, d_1:], i), axis=-1)
            return v

        return v_ref


class DoubleWellGeneral(DoubleWell_multidim):
    """DoubleWell_multidim adapted for the general solver
    (problems.py:479-688): square geometry [-2.5, 2.5]^d (unbounded flavor),
    modus 'HJB' (h = -1/2|z|^2, terminal = sum eta (x-1)^2) or 'linear'
    (h = 0, terminal = exp(-g), solving for psi directly;
    problems.py:517-534)."""

    def __init__(self, name="Double well", d=1, d_1=1, d_2=0, T=1.0, eta=1.0,
                 kappa=1.0, modus="HJB"):
        super().__init__(name=name, d=d, d_1=d_1, d_2=d_2, T=T, eta=eta,
                         kappa=kappa)
        self.modus = modus
        self.geometry = Geometry(kind="unbounded_square", X_l=-2.5, X_r=2.5)

    def h(self, t, x, y, z):
        if self.modus == "linear":
            return jnp.zeros(x.shape[0], dtype=x.dtype)
        return -0.5 * jnp.sum(z * z, axis=-1)

    def f_terminal(self, x):
        g = jnp.sum(self.eta_ * (x - 1.0) ** 2, axis=-1)
        if self.modus == "linear":
            return jnp.exp(-g)
        return g

    def v_ref_fn(self, ts: np.ndarray):
        """Product of psi (linear modus) or sum of -log psi
        (problems.py:682-685)."""
        assert self.ref_sol_is_defined
        idx = _t_to_index(ts, self.ref_delta_t, self._psi1.shape[0] - 1)
        if self.modus != "linear":
            return super().v_ref_fn(ts)
        lut1 = _TableLookup1D(self._psi1[idx], self.xb, self.dx)
        lut2 = _TableLookup1D(self._psi2[idx], self.xb, self.dx)
        d_1 = self.d_1

        def v_ref(x, i):
            v = jnp.ones(x.shape[0], dtype=x.dtype)
            if d_1 > 0:
                v = v * jnp.prod(lut1(x[:, :d_1], i), axis=-1)
            if d_1 < x.shape[1]:
                v = v * jnp.prod(lut2(x[:, d_1:], i), axis=-1)
            return v

        return v_ref


class DoubleWell_multidim_2(Problem):
    """Radial double well kappa ((|x|^2-3)^2-1)^2 (problems.py:691-727);
    no reference solution (zeros)."""

    h_is_y_free = True

    def __init__(self, name="Double well", d=1, T=1.0, alpha=1.0, kappa=1.0):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.alpha, self.kappa = float(alpha), float(kappa)
        self.B = jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = jnp.ones((d,), dtype=jnp.float32) / jnp.sqrt(float(d))

    @property
    def sigma_struct(self):
        return self._sigma

    def grad_V(self, x):
        r = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
        return 4.0 * self.kappa * (r - 3.0) * ((r - 3.0) ** 2 - 1.0) * x / r

    def b(self, x):
        return -self.grad_V(x)

    def f(self, x, t):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, t, x, y, z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    def g(self, x):
        r = jnp.sqrt(jnp.sum(x * x, axis=-1))
        return self.alpha * (r - 2.0) ** 2


class DoubleWell_multidim_3(DoubleWell_multidim):
    """Isotropic product double well (problems.py:730-840): all d dimensions
    carry (eta, kappa) — i.e. DoubleWell_multidim with d_1 = d."""

    def __init__(self, name="Double well", d=1, T=1.0, eta=1.0, kappa=1.0):
        super().__init__(name=name, d=d, d_1=d, d_2=0, T=T, eta=eta,
                         kappa=kappa)
        self.geometry = None


class DoubleWell_OU(Problem):
    """Dim 0 is a double well, dims 1..d-1 are OU with rate a=5
    (problems.py:843-959); g couples a double-well terminal in x_0 with a
    linear cost on the OU block."""

    h_is_y_free = True

    def __init__(self, name="Double well", d=1, T=1.0, alpha=1.0, kappa=1.0):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.alpha, self.kappa = float(alpha), float(kappa)
        self.gamma = jnp.ones((d - 1,), dtype=jnp.float32)
        self.a = 5.0
        self.B = jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = jnp.asarray([-1.0] + [0.0] * (d - 1), dtype=jnp.float32)
        self.ref_sol_is_defined = False

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        dw = -4.0 * self.kappa * x[:, :1] * (x[:, :1] ** 2 - 1.0)
        return jnp.concatenate([dw, -self.a * x[:, 1:]], axis=-1)

    def f(self, x, t):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, t, x, y, z):
        return -0.5 * jnp.sum(z * z, axis=-1)

    def g(self, x):
        return self.alpha * (x[:, 0] - 1.0) ** 2 + x[:, 1:] @ self.gamma

    def compute_reference_solution(self, delta_t=0.005, xb=2.5, nx=1000):
        _, psi, u, dx = parabolic_log_transform_reference(
            lambda x: self.kappa * (x ** 2 - 1.0) ** 2,
            lambda x: self.alpha * (x - 1.0) ** 2,
            self.T, delta_t=delta_t, xb=xb, nx=nx, B00=1.0)
        self.ref_delta_t, self.xb, self.dx = delta_t, xb, dx
        self._psi_np, self._u_np = psi, u
        self.ref_sol_is_defined = True

    def u_ref_fn(self, ts: np.ndarray):
        """Dim 0 via FD table; OU dims closed-form
        u = -e^{a (t - T)} gamma (problems.py:957-959)."""
        assert self.ref_sol_is_defined
        idx = _t_to_index(ts, self.ref_delta_t, self._u_np.shape[0] - 1)
        lut = _TableLookup1D(self._u_np[idx], self.xb, self.dx)
        ou_scale = jnp.asarray(-np.exp(self.a * (np.asarray(ts) - self.T)),
                               dtype=jnp.float32)
        gamma = self.gamma

        def u_ref(x, i):
            u0 = lut(x[:, :1], i)
            u_ou = jnp.broadcast_to(ou_scale[i] * gamma, x[:, 1:].shape)
            return jnp.concatenate([u0, u_ou], axis=-1)

        return u_ref


class _DoubleWellStoppingBase(Problem):
    """Shared machinery for the first-exit double-well problems."""

    def __init__(self, d=1, beta=1.0, eta_B=1.0, dx=0.01, X_r=1.0):
        super().__init__(d=d)
        self.beta = float(beta)
        self.B = eta_B * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = -jnp.ones((d,), dtype=jnp.float32)
        self.geometry = Geometry(kind="square", X_l=-2.0, X_r=X_r,
                                 one_boundary=True)
        self.dx_ref = float(dx)
        self.ref_sol_is_defined = False
        if d != 1:
            print("The double well example is only implemented for d = 1.")

    @property
    def sigma_struct(self):
        return self._sigma

    def grad_V_np(self, x):
        return 4.0 * self.beta * x * (x ** 2 - 1.0)

    def b(self, x):
        return -4.0 * self.beta * x * (x ** 2 - 1.0)

    def _lookup(self, table, x, clip_hi):
        idx = jnp.clip(jnp.floor((x[:, 0] + 2.0) / self.dx_ref)
                       .astype(jnp.int32), 0, clip_hi)
        return jnp.take(jnp.asarray(table, dtype=jnp.float32), idx)


class DoubleWell_stopping(_DoubleWellStoppingBase):
    """First-exit HJB: h = -1/2|z|^2 + 1, exit at x = 1
    (problems.py:1220-1309)."""

    def __init__(self, name="Double well", d=1, beta=1.0):
        super().__init__(d=d, beta=beta)
        self.name = name

    def f(self, x, t=None):
        return jnp.ones(x.shape[0], dtype=x.dtype)

    def g(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, x, y, z):
        return -0.5 * jnp.sum(z * z, axis=-1) + 1.0

    def compute_reference_solution(self):
        _, psi, u = elliptic_generator_reference(
            self.grad_V_np, sigma=1.0, f=1.0, rhs=0.0, bc_value=1.0,
            dx=self.dx_ref)
        self._psi_np, self._u_np = psi, u
        self.ref_sol_is_defined = True

    def v_ref(self, x):
        return self._lookup(-np.log(np.maximum(self._psi_np, 1e-300)), x, 298)

    def u_ref(self, x, t=None):
        return self._lookup(self._u_np, x, 298)[:, None]


class DoubleWell_stopping_linear(_DoubleWellStoppingBase):
    """Linearized variant: h = -f y, solves for psi directly
    (problems.py:1312-1401)."""

    def __init__(self, name="Double well", d=1, beta=1.0):
        super().__init__(d=d, beta=beta)
        self.name = name

    def f(self, x, t=None):
        return jnp.ones(x.shape[0], dtype=x.dtype)

    def g(self, x):
        return jnp.ones(x.shape[0], dtype=x.dtype)

    def h(self, x, y, z):
        return -y

    def compute_reference_solution(self):
        _, psi, u = elliptic_generator_reference(
            self.grad_V_np, sigma=1.0, f=1.0, rhs=0.0, bc_value=1.0,
            dx=self.dx_ref)
        self._psi_np, self._u_np = psi, u
        self.ref_sol_is_defined = True

    def v_ref(self, x):
        return self._lookup(self._psi_np, x, 298)


class DoubleWell_expectation_hitting_time(_DoubleWellStoppingBase):
    """Expected hitting time: (L psi) = -1 with psi = 0 at the barrier
    (problems.py:1404-1496); h = 1."""

    def __init__(self, name="Double well", d=1, beta=1.0, dx=0.01, eta=2.0):
        super().__init__(d=d, beta=beta, eta_B=eta, dx=dx)
        self.name = name

    def f(self, x, t=None):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def g(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, x, y, z):
        return jnp.ones(y.shape[0], dtype=y.dtype)

    def compute_reference_solution(self):
        index_r = int((self.geometry.X_r - self.geometry.X_l) / self.dx_ref)
        _, psi, u = elliptic_generator_reference(
            self.grad_V_np, sigma=float(self.B[0, 0]), f=0.0, rhs=-1.0,
            bc_value=0.0, bc_lo=index_r, bc_hi=int(index_r * 1.1),
            dx=self.dx_ref)
        self._psi_np, self._u_np = psi, u
        self._index_r = index_r
        self.ref_sol_is_defined = True

    def v_ref(self, x):
        return self._lookup(self._psi_np, x, self._index_r)


class Committor_DoubleWell(Problem):
    """1-d committor, parabolic variant (problems.py:1499-1543)."""

    def __init__(self, name="Double well", d=1, beta=1.0, dx=0.01, eta=2.0,
                 T=1.0):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.beta = float(beta)
        self.B = float(np.sqrt(eta)) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = -jnp.ones((d,), dtype=jnp.float32)
        self.geometry = Geometry(kind="square", X_l=-2.0, X_r=0.0,
                                 one_boundary=True)
        self.boundary_type = "Dirichlet"

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        return -4.0 * self.beta * x * (x ** 2 - 1.0)

    def f(self, x, t=None):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def g(self, x, t=None):
        return jnp.ones(x.shape[0], dtype=x.dtype)

    def h(self, t, x, y, z):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def f_terminal(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)
