"""Eigenvalue problems on the torus [0, 2*pi]^d.

The reference defines these inline in notebooks; they are first-class here:
  * ``FokkerPlanckEigen``  — "Eigenvalue - Fokker-Planck.ipynb" cell 2:
      generator eigenproblem with drift b = -cos(sum c cos x) c sin(x),
      lambda_true = 0, eigenfunction exp(-sin(sum c cos x)).
  * ``SchrodingerEigen``   — "Eigenvalue - nonlinear Schroedinger equation,
      d = 5/10.ipynb" cell 5: cubic nonlinearity h = -y^3 - y (...),
      lambda_true = -3, eigenfunction (1/c) exp((1/d) sum cos x) with c the
      L^2-normalization constant (1.1040855 for d=5, 1.0511402 for d=10).

Both use periodic boundary conditions enforced by value+gradient matching
on opposite faces of the box; see :class:`pspde.solvers.eigen.EigenSolver`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from scipy import integrate

from .base import DiffusionMatrix, Geometry, Problem


class FokkerPlanckEigen(Problem):
    """Fokker-Planck generator eigenproblem (FP eigenvalue notebook cell 2)."""

    def __init__(self, name="Eigenvalue", d=1):
        super().__init__(d=d)
        self.name = name
        self.B = jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.c = 0.1 * jnp.ones((d,), dtype=jnp.float32)
        self.X_0 = jnp.pi * jnp.ones((d,), dtype=jnp.float32)
        self.lambda_true = 0.0
        self.geometry = Geometry(kind="square", X_l=0.0, X_r=2.0 * np.pi)

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        s = jnp.sum(self.c * jnp.cos(x), axis=-1, keepdims=True)
        return -jnp.cos(s) * self.c * jnp.sin(x)

    def g(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, x, y, z):
        s = jnp.sum(self.c * jnp.cos(x), axis=-1)
        return y * (-jnp.sum(self.c ** 2 * jnp.sin(x) ** 2, axis=-1)
                    * jnp.sin(s) - jnp.cos(s) * s)

    def v_ref(self, x):
        return jnp.exp(-jnp.sin(jnp.sum(self.c * jnp.cos(x), axis=-1)))

    # -- transposed-coefficient protocol (base.py), batch in columns ----
    def b_T(self, xT):
        s = jnp.sum(self.c[:, None] * jnp.cos(xT), axis=0, keepdims=True)
        return -jnp.cos(s) * self.c[:, None] * jnp.sin(xT)

    def h_T(self, xT, y, zT):
        s = jnp.sum(self.c[:, None] * jnp.cos(xT), axis=0)
        return y * (-jnp.sum(self.c[:, None] ** 2 * jnp.sin(xT) ** 2,
                             axis=0) * jnp.sin(s) - jnp.cos(s) * s)

    def v_ref_T(self, xT):
        return jnp.exp(-jnp.sin(jnp.sum(self.c[:, None] * jnp.cos(xT),
                                        axis=0)))


class SchrodingerEigen(Problem):
    """Nonlinear Schroedinger eigenproblem (Schroedinger notebooks cell 5).

    The normalization constant c solves ||(1/c) exp((1/d) sum cos x)||_L2 = 1
    and is computed here by quadrature (notebook cell 1) instead of being
    hardcoded, reproducing 1.1040855 (d=5) / 1.0511402 (d=10).
    """

    def __init__(self, name="Eigenvalue", d=1):
        super().__init__(d=d)
        self.name = name
        self.B = jnp.sqrt(2.0) * jnp.eye(d, dtype=jnp.float32)
        self._sigma = DiffusionMatrix(self.B)
        self.X_0 = jnp.pi * jnp.ones((d,), dtype=jnp.float32)
        self.lambda_true = -3.0
        self.geometry = Geometry(kind="square", X_l=0.0, X_r=2.0 * np.pi)
        val = integrate.quad(lambda x: np.exp(2.0 / d * np.cos(x)),
                             0.0, 2.0 * np.pi)[0]
        self.c = float(np.sqrt(val ** d / (2.0 * np.pi) ** d))

    @property
    def sigma_struct(self):
        return self._sigma

    def b(self, x):
        return jnp.zeros_like(x)

    def g(self, x):
        return jnp.zeros(x.shape[0], dtype=x.dtype)

    def h(self, x, y, z):
        pot = (-1.0 / self.c ** 2
               * jnp.exp(2.0 / self.d * jnp.sum(jnp.cos(x), axis=-1))
               + jnp.sum(jnp.sin(x) ** 2 / self.d ** 2
                         - jnp.cos(x) / self.d, axis=-1) - 3.0)
        return -y ** 3 - y * pot

    def v_ref(self, x):
        return (1.0 / self.c
                * jnp.exp(1.0 / self.d * jnp.sum(jnp.cos(x), axis=-1)))

    # -- transposed-coefficient protocol (base.py), batch in columns ----
    def b_T(self, xT):
        return jnp.zeros_like(xT)

    def h_T(self, xT, y, zT):
        pot = (-1.0 / self.c ** 2
               * jnp.exp(2.0 / self.d * jnp.sum(jnp.cos(xT), axis=0))
               + jnp.sum(jnp.sin(xT) ** 2 / self.d ** 2
                         - jnp.cos(xT) / self.d, axis=0) - 3.0)
        return -y ** 3 - y * pot

    def v_ref_T(self, xT):
        return (1.0 / self.c
                * jnp.exp(1.0 / self.d * jnp.sum(jnp.cos(xT), axis=0)))
