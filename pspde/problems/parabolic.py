"""Parabolic problems for the general (space-time) solver.

Rebuilds:
  * ``HeatEquation``                        — problems.py:1733-1764
  * ``AllenCahn``                           — problems.py:1175-1217
  * ``ExponentialOnSphereParabolic``        — problems.py:1103-1134
  * ``ExponentialOnSphereNonlinearParabolic`` — problems.py:1137-1172

Protocol (GeneralSolver family, cf. solver.py:1062-1074):
  ``f_terminal(x) -> (K,)``  terminal condition V(x, T) (named ``f`` in the
  reference), ``g(x, t)``   spatial boundary data, ``h(t, x, y, z)``
  nonlinearity, ``v_ref(x, t)`` reference solution.
"""

from __future__ import annotations

import jax.numpy as jnp

from .base import DiffusionMatrix, Geometry, Problem


class HeatEquation(Problem):
    """d-dimensional heat equation, v = |x|^2 + 2(T-t)d (problems.py:1733-1764)."""

    h_is_y_free = True

    def __init__(self, name="Heat equation", d=1, T=1.0, seed=42):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.B = jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.geometry = Geometry(kind="unbounded", boundary_distance=1.0)
        self.boundary_type = "Dirichlet"

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        return jnp.zeros_like(x)

    def g(self, x, t=None):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, t, x, y, z):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def f_terminal(self, x):
        return jnp.sum(x * x, axis=-1)

    # transposed-coefficient protocol (base.py): zero drift / h, so the
    # column-layout forms are trivial
    def b_T(self, xT):
        return jnp.zeros_like(xT)

    def h_T(self, t, xT, y, zT):
        return jnp.zeros(xT.shape[1], dtype=xT.dtype)

    def f_T(self, xT, t):
        return jnp.zeros(xT.shape[1], dtype=xT.dtype)

    def v_ref(self, x, t):
        return jnp.sum(x * x, axis=-1) + 2.0 * (self.T - t) * self.d


class AllenCahn(Problem):
    """Allen-Cahn with cubic nonlinearity h = y - y^3, d=100 benchmark problem.

    problems.py:1175-1217; terminal condition f = 1 / (2 + 0.4 |x|^2)
    (problems.py:1206-1209).  The literature value v(0, x=0) = 0.052802 is
    used as a scalar oracle (Allen-Cahn.ipynb cell 13).
    """

    V0_LITERATURE = 0.052802

    def __init__(self, name="Allen-Cahn", d=1, T=0.3, seed=42):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.B = jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.geometry = Geometry(kind="unbounded", boundary_distance=2.0)

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        return jnp.zeros_like(x)

    def h(self, t, x, y, z):
        return y - y ** 3

    def f_terminal(self, x):
        return 1.0 / (2.0 + 0.4 * jnp.sum(x * x, axis=-1))

    # transposed-coefficient protocol (base.py): b = 0 and h touches only
    # the per-path y, so the column forms are trivial
    def b_T(self, xT):
        return jnp.zeros_like(xT)

    def h_T(self, t, xT, y, zT):
        return y - y ** 3

    def f_T(self, xT, t=None):
        return jnp.zeros(xT.shape[1], dtype=xT.dtype)


class ExponentialOnSphereParabolic(Problem):
    """Manufactured linear parabolic problem, v = exp(alpha |x|^2 + t)
    on the unit ball (problems.py:1103-1134)."""

    def __init__(self, name="Exponential on sphere", d=2, T=1.0, alpha=1.0):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.alpha = float(alpha)
        self.B = jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.geometry = Geometry(kind="sphere", boundary_distance=1.0)
        self.boundary_type = "Dirichlet"

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        return jnp.zeros_like(x)

    def f_terminal(self, x):
        return jnp.exp(self.alpha * jnp.sum(x * x, axis=-1) + self.T)

    def g(self, x, t):
        return jnp.exp(self.alpha * jnp.sum(x * x, axis=-1) + t)

    def h(self, t, x, y, z):
        return -y * (2.0 * self.alpha
                     * (self.alpha * 2.0 * jnp.sum(x * x, axis=-1) + self.d)
                     + 1.0)

    def v_ref(self, x, t):
        return jnp.exp(self.alpha * jnp.sum(x * x, axis=-1) + t)


class ExponentialOnSphereNonlinearParabolic(Problem):
    """Nonlinear parabolic variant with sin() nonlinearity and optional
    Neumann boundary data (problems.py:1137-1172)."""

    def __init__(self, name="Exponential on ball", d=2, T=1.0, alpha=1.0,
                 boundary_type="Dirichlet"):
        super().__init__(d=d, T=float(T))
        self.name = name
        self.alpha = float(alpha)
        self.B = jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.geometry = Geometry(kind="sphere", boundary_distance=1.0)
        self.boundary_type = boundary_type

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        return jnp.zeros_like(x)

    def f_terminal(self, x):
        return jnp.exp(self.alpha * jnp.sum(x * x, axis=-1) + self.T)

    def g(self, x, t):
        if self.boundary_type == "Neumann":
            # gradient data (K, d), problems.py:1160-1161
            return 2.0 * self.alpha * x * jnp.exp(
                self.alpha * jnp.sum(x * x, axis=-1) + t)[:, None]
        return jnp.exp(self.alpha * jnp.sum(x * x, axis=-1) + t)

    def h(self, t, x, y, z):
        r2 = jnp.sum(x * x, axis=-1)
        return (-2.0 * self.alpha * y * (self.alpha * 2.0 * r2 + self.d) - y
                + jnp.sin(jnp.exp(2.0 * self.alpha * r2 + 2.0 * t) - y ** 2))

    # transposed-coefficient protocol (base.py): x enters only via |x|^2
    def b_T(self, xT):
        return jnp.zeros_like(xT)

    def h_T(self, t, xT, y, zT):
        r2 = jnp.sum(xT * xT, axis=0)
        return (-2.0 * self.alpha * y * (self.alpha * 2.0 * r2 + self.d) - y
                + jnp.sin(jnp.exp(2.0 * self.alpha * r2 + 2.0 * t) - y ** 2))

    def f_T(self, xT, t=None):
        return jnp.zeros(xT.shape[1], dtype=xT.dtype)

    def v_ref(self, x, t):
        return jnp.exp(self.alpha * jnp.sum(x * x, axis=-1) + t)
