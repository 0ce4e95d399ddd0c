"""Function-space (ansatz) library in Flax.

Rebuilds every approximator class of the reference's ``function_space.py``
plus the notebook-local variants, as pure Flax modules (single optax
optimizer over the combined param PyTree replaces the reference's
per-module Adam; cf. function_space.py:18,104,131,150,168,185 and
solver.py:194-200):

  * ``DenseNet``       — function_space.py:116-140: concat-skip MLP with
                         relu(Wx+b)^2 hidden features, weights 0.1*randn,
                         zero bias.  ``bias_init_value`` and
                         ``output_relu`` cover the notebook variants
                         (FP-eigenvalue nb cell 1: bias 0.8 + relu output;
                         Schroedinger nb cell 4: bias 0.1).
  * ``DenseNetTanh``   — function_space.py:143-158: nn.Linear + tanh concat.
  * ``DenseNetTanh2``  — Committor nb cell 1: 0.1*randn weights, tanh(.)^2.
  * ``TanhMLP``        — ``MySequential``, function_space.py:177-195:
                         [d_in, 30, 30, d_out] tanh MLP, N(0, 0.01) init.
  * ``BatchNormMLP``   — ``NN``, function_space.py:82-113 (functional
                         batch statistics — the reference only ever runs it
                         in training mode, which uses per-batch stats).
  * ``ReluMLP1d``      — ``NN_Nik``, function_space.py:161-174.
  * ``Sines``          — function_space.py:66-79.
  * ``ScalarParam``    — ``SingleParam``, function_space.py:6-21 (used for
                         y_0 and the eigenvalue lambda).
  * ``ConstantVector`` — ``Constant``, function_space.py:24-34.
  * ``LinearLQ``       — ``Linear``, function_space.py:37-48.
  * ``Affine``         — function_space.py:51-63.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _scaled_normal(scale):
    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.normal(key, shape, dtype)
    return init


class DenseNet(nn.Module):
    """Concat-skip DenseNet with relu^2 hidden features.

    Layer i maps the running feature vector (width sum(dims[:i+1])) through
    a dense layer; hidden outputs are relu(.)^2 and concatenated onto the
    features (function_space.py:133-140).
    """

    d_out: int
    arch: Sequence[int] = (30, 30)
    weight_scale: float = 0.1
    bias_init_value: float = 0.0
    output_relu: bool = False
    compute_dtype: Optional[jnp.dtype] = None  # e.g. bf16 on the MXU

    @nn.compact
    def __call__(self, x):
        feats = x
        for width in self.arch:
            h = nn.Dense(
                width,
                kernel_init=_scaled_normal(self.weight_scale),
                bias_init=nn.initializers.constant(self.bias_init_value),
                dtype=self.compute_dtype,
            )(feats)
            feats = jnp.concatenate(
                [feats, (nn.relu(h) ** 2).astype(x.dtype)], axis=-1)
        out = nn.Dense(
            self.d_out,
            kernel_init=_scaled_normal(self.weight_scale),
            bias_init=nn.initializers.constant(self.bias_init_value),
            dtype=self.compute_dtype,
        )(feats)
        if self.output_relu:
            out = nn.relu(out)
        return out.astype(x.dtype)


class DenseNetTanh(nn.Module):
    """Concat-skip net with tanh hidden features (function_space.py:143-158).
    ``output_relu`` covers the notebook ``DenseNet_2`` variant used for
    nonnegative eigenfunctions (Schroedinger notebook cell 4)."""

    d_out: int
    arch: Sequence[int] = (30, 30)
    output_relu: bool = False

    @nn.compact
    def __call__(self, x):
        feats = x
        for width in self.arch:
            h = nn.Dense(width)(feats)
            feats = jnp.concatenate([feats, jnp.tanh(h)], axis=-1)
        out = nn.Dense(self.d_out)(feats)
        if self.output_relu:
            out = nn.relu(out)
        return out


class DenseNetTanh2(nn.Module):
    """Concat-skip net with tanh(.)^2 features and 0.1*randn weights
    (Committor function.ipynb cell 1)."""

    d_out: int
    arch: Sequence[int] = (30, 30)
    weight_scale: float = 0.1

    @nn.compact
    def __call__(self, x):
        feats = x
        for width in self.arch:
            h = nn.Dense(width, kernel_init=_scaled_normal(self.weight_scale),
                         bias_init=nn.initializers.zeros)(feats)
            feats = jnp.concatenate([feats, jnp.tanh(h) ** 2], axis=-1)
        return nn.Dense(self.d_out,
                        kernel_init=_scaled_normal(self.weight_scale),
                        bias_init=nn.initializers.zeros)(feats)


class DenseNetRelu(nn.Module):
    """Concat-skip net with plain relu hidden features, weights
    0.01*randn + 0.01 and bias 0.1, linear output (the ``DenseNet_relu``
    class local to "Eigenvalue - nonlinear Schroedinger equation,
    d = 10.ipynb" cell 4)."""

    d_out: int
    arch: Sequence[int] = (30, 30)

    @nn.compact
    def __call__(self, x):
        def kinit(key, shape, dtype=jnp.float32):
            return 0.01 * jax.random.normal(key, shape, dtype) + 0.01
        feats = x
        for width in self.arch:
            h = nn.Dense(width, kernel_init=kinit,
                         bias_init=nn.initializers.constant(0.1))(feats)
            feats = jnp.concatenate([feats, nn.relu(h)], axis=-1)
        return nn.Dense(self.d_out, kernel_init=kinit,
                        bias_init=nn.initializers.constant(0.1))(feats)


class TanhMLP(nn.Module):
    """[d_in, 30, 30, d_out] tanh MLP with N(0, 0.01) weight AND bias init
    — the default 'inner' time-approx control net (``MySequential``,
    function_space.py:177-195, used at solver.py:91)."""

    d_out: int
    hidden: Sequence[int] = (30, 30)
    init_scale: float = 0.01
    compute_dtype: Optional[jnp.dtype] = None  # e.g. bf16 on the MXU

    @nn.compact
    def __call__(self, x):
        in_dtype = x.dtype
        for width in self.hidden:
            x = nn.Dense(width, kernel_init=_scaled_normal(self.init_scale),
                         bias_init=_scaled_normal(self.init_scale),
                         dtype=self.compute_dtype)(x)
            x = jnp.tanh(x)
        out = nn.Dense(self.d_out,
                       kernel_init=_scaled_normal(self.init_scale),
                       bias_init=_scaled_normal(self.init_scale),
                       dtype=self.compute_dtype)(x)
        return out.astype(in_dtype)


class BatchNormMLP(nn.Module):
    """Plain MLP with per-batch normalization layers (``NN``,
    function_space.py:82-113).  The reference never uses running averages
    in its training loops, so normalization uses the batch statistics."""

    d_out: int
    hidden: int = 20

    @nn.compact
    def __call__(self, x):
        def bn(v):
            mu = jnp.mean(v, axis=0, keepdims=True)
            var = jnp.var(v, axis=0, keepdims=True)
            scale = self.param(f"bn_scale_{bn.i}", nn.initializers.ones,
                               (v.shape[-1],))
            bias = self.param(f"bn_bias_{bn.i}", nn.initializers.zeros,
                              (v.shape[-1],))
            bn.i += 1
            return scale * (v - mu) / jnp.sqrt(var + 1e-5) + bias

        bn.i = 0
        x = bn(x)
        x = nn.Dense(self.hidden, use_bias=False,
                     kernel_init=nn.initializers.normal(1.0))(x)
        x = bn(x)
        x = nn.relu(x)
        x = nn.Dense(self.d_out, use_bias=False,
                     kernel_init=nn.initializers.normal(1.0))(x)
        x = bn(x)
        return x


class ReluMLP1d(nn.Module):
    """Tiny 1-d two-layer ReLU net (``NN_Nik``, function_space.py:161-174)."""

    hidden: int = 16

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.relu(x)
        return nn.Dense(1)(x)


class Sines(nn.Module):
    """Linear combination of M sine basis functions, d = 1 only
    (function_space.py:66-79)."""

    M: int = 10

    @nn.compact
    def __call__(self, x):
        omega = jnp.linspace(1.0, float(self.M), self.M)[None, :]
        alpha = self.param("alpha", nn.initializers.normal(1.0), (self.M, 1))
        return jnp.sin(x @ omega) @ alpha


class ScalarParam(nn.Module):
    """Single learnable scalar broadcast over the batch (``SingleParam``,
    function_space.py:6-21).  Used for Y_0 and the eigenvalue lambda."""

    initial: Optional[float] = 0.0  # None => random

    @nn.compact
    def __call__(self, x):
        if self.initial is None:
            init = nn.initializers.normal(1.0)
        else:
            init = nn.initializers.constant(self.initial)
        y0 = self.param("Y_0", init, (1,))
        return jnp.broadcast_to(y0, (x.shape[0],))


class ConstantVector(nn.Module):
    """Learnable constant d-vector (``Constant``, function_space.py:24-34)."""

    d: int

    @nn.compact
    def __call__(self, x):
        c = self.param("c", nn.initializers.normal(1.0), (self.d,))
        return jnp.broadcast_to(c, (x.shape[0], self.d))


class LinearLQ(nn.Module):
    """LQ-structured linear control u = Q^{-1} B^T F x with learnable F
    (``Linear``, function_space.py:37-48).

    ``init_scale`` scales the N(0,1) init of F (reference: 1.0).  At
    large d a standard-normal F is a violent initial control (|u| ~ d
    per unit |x|) that destabilizes the adaptive forward process and
    makes u_L2[0] meaningless as a |u*| yardstick — init_scale=0.0
    starts from the zero control instead."""

    B: jnp.ndarray
    Q: jnp.ndarray
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        d = self.B.shape[0]
        F = self.param("F", nn.initializers.normal(self.init_scale), (d, d))
        gain = jnp.linalg.inv(self.Q) @ self.B.T @ F
        return x @ gain.T


class LinearLQTime(nn.Module):
    """Time-conditioned LQ-structured linear control for
    ``time_approx='inner'`` (input ``[t, x]``):

        u(t, x) = Q^{-1} B^T F_hat(t) x,
        F_hat(t) = sum_j T_j(2 t / T - 1) F_j

    with a Chebyshev time basis over ``degree + 1`` learnable (d, d)
    matrices, zero-initialized.  The exact LQGC Riccati control
    u* = -Q^{-1} B^T F(t) x (problems.py:169-175) is LINEAR in x with a
    smooth (Riccati) time dependence, so this ansatz contains it up to
    the Chebyshev interpolation error of F(t) — unlike the reference's
    per-step ``Linear`` (function_space.py:37-48, one independent F per
    time step, each seeing 1/N of the loss signal), every step trains
    the same (degree + 1) matrices.  No reference counterpart: this is
    the shared-across-steps LQ ansatz the d=100 BASELINE config needs.
    """

    B: jnp.ndarray
    Q: jnp.ndarray
    T: float
    degree: int = 8

    @nn.compact
    def __call__(self, tx):
        d = self.B.shape[0]
        t, x = tx[:, :1], tx[:, 1:]
        s = 2.0 * t / self.T - 1.0
        feats = [jnp.ones_like(s), s]
        for _ in range(self.degree - 1):
            feats.append(2.0 * s * feats[-1] - feats[-2])
        phi = jnp.concatenate(feats[: self.degree + 1], axis=1)  # (K, J)
        F = self.param("F", nn.initializers.zeros,
                       (self.degree + 1, d, d))
        gain = jnp.linalg.inv(self.Q) @ self.B.T               # (d, d)
        # J matmuls of (K, d) x (d, d) — MXU-friendly; the per-row basis
        # contraction is O(K J d)
        xF = jnp.einsum("ke,jde->kjd", x, F)
        return jnp.einsum("kj,kjd->kd", phi, xF) @ gain.T


class Affine(nn.Module):
    """Zero-initialized affine map A x + b (function_space.py:51-63)."""

    d_out: int

    @nn.compact
    def __call__(self, x):
        A = self.param("A", nn.initializers.zeros, (self.d_out, x.shape[-1]))
        b = self.param("b", nn.initializers.zeros, (1, self.d_out))
        return x @ A.T + b
