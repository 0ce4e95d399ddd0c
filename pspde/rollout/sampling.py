"""Geometry samplers for domain / boundary points, fixed-K and jittable.

Rebuilds the per-geometry sampling blocks of the elliptic/general solvers
(solver.py:647-708, 828-882, 1020-1056) as pure functions of a PRNG key.

XLA note: the reference's ``two_spheres`` domain sampler REJECTS points
inside the inner sphere and *shrinks the batch* per iteration
(solver.py:699-703) — dynamic shapes are hostile to XLA, and rejection to
the annulus is distributionally identical to sampling the radial
inverse-CDF directly, so we draw r = (r1^d + U (r2^d - r1^d))^{1/d} with a
Gaussian direction: exact uniform-on-annulus at fixed K.

The square boundary sampler pins one uniformly-chosen coordinate of each
point to a face (first half X_l, second half X_r — solver.py:656-665); the
reflected variant used by the periodic eigenvalue solvers additionally
returns the point with the pinned coordinate flipped to the opposite face
(FP-eigenvalue notebook cell 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..problems.base import Geometry


def _unit_directions(key, K, d):
    x = jax.random.normal(key, (K, d))
    return x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))


def sample_domain(key, geom: Geometry, K: int, d: int,
                  uniform_square: bool = False):
    """Uniform sample in the domain interior."""
    k1, k2 = jax.random.split(key)
    kind = geom.kind
    if kind in ("sphere", "unbounded"):
        if uniform_square:
            # solver.py:689-690: cube direction x uniform radius (the
            # intentionally non-uniform ablation)
            x = jax.random.uniform(k1, (K, d)) * 2.0 - 1.0
            x = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            r = jax.random.uniform(k2, (K, 1))
            return geom.boundary_distance * x * r
        dirs = _unit_directions(k1, K, d)
        r = jax.random.uniform(k2, (K, 1)) ** (1.0 / d)
        return geom.boundary_distance * dirs * r
    if kind == "two_spheres":
        if uniform_square:
            # solver.py:696-697 verbatim formula (per-coordinate radius)
            x = jax.random.uniform(k1, (K, d)) * 2.0 - 1.0
            x = x / jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
            r = (jax.random.uniform(k2, (K, d))
                 * (geom.boundary_distance_2 - geom.boundary_distance_1)
                 + geom.boundary_distance_1)
            return x * r
        dirs = _unit_directions(k1, K, d)
        r1, r2 = geom.boundary_distance_1, geom.boundary_distance_2
        u = jax.random.uniform(k2, (K, 1))
        r = (r1 ** d + u * (r2 ** d - r1 ** d)) ** (1.0 / d)
        return dirs * r
    if kind in ("square", "unbounded_square"):
        return ((geom.X_r - geom.X_l) * jax.random.uniform(k1, (K, d))
                + geom.X_l)
    if kind == "square-corner":
        x = ((geom.X_r - geom.X_l) * jax.random.uniform(k1, (K, d))
             + geom.X_l)
        in_corner = jnp.all(x > geom.X_corner, axis=-1, keepdims=True)
        return jnp.where(in_corner, -x, x)
    raise ValueError(kind)


def sample_boundary(key, geom: Geometry, K: int, d: int):
    """Uniform sample on the boundary (solver.py:647-673)."""
    k1, k2, k3 = jax.random.split(key, 3)
    kind = geom.kind
    if kind in ("sphere", "unbounded"):
        return geom.boundary_distance * _unit_directions(k1, K, d)
    if kind == "two_spheres":
        dirs = _unit_directions(k1, K, d)
        radii = jnp.where(jnp.arange(K)[:, None] < K // 2,
                          geom.boundary_distance_1, geom.boundary_distance_2)
        return radii * dirs
    if kind in ("square", "unbounded_square", "square-corner"):
        lo = geom.X_corner if kind == "square-corner" else geom.X_l
        hi = geom.X_r
        x = (hi - lo) * jax.random.uniform(k1, (K, d)) + lo
        face_dim = jax.random.randint(k2, (K,), 0, d)
        onehot = jax.nn.one_hot(face_dim, d, dtype=bool)
        if kind == "square-corner":
            face_val = jnp.full((K, 1), geom.X_corner)
        elif geom.one_boundary:
            face_val = jnp.full((K, 1), geom.X_r)
        else:
            face_val = jnp.where(jnp.arange(K)[:, None] < K // 2,
                                 geom.X_l, geom.X_r)
        return jnp.where(onehot, face_val, x)
    raise ValueError(kind)


def sample_boundary_reflected(key, geom: Geometry, K: int, d: int):
    """Square boundary sample plus its periodic reflection (the pinned
    coordinate moved to the opposite face) — FP-eigenvalue nb cell 4."""
    k1, k2 = jax.random.split(key)
    x = ((geom.X_r - geom.X_l) * jax.random.uniform(k1, (K, d)) + geom.X_l)
    face_dim = jax.random.randint(k2, (K,), 0, d)
    onehot = jax.nn.one_hot(face_dim, d, dtype=bool)
    face_val = jnp.where(jnp.arange(K)[:, None] < K // 2, geom.X_l, geom.X_r)
    face_val_reflect = jnp.where(jnp.arange(K)[:, None] < K // 2,
                                 geom.X_r, geom.X_l)
    return (jnp.where(onehot, face_val, x),
            jnp.where(onehot, face_val_reflect, x))


def inside_fn(geom: Geometry):
    """Domain-membership test for the stopped rollout.

    Reference quirk reproduced: sphere/two_spheres test the CURRENT state
    (solver.py:750-753) while square variants test the PROPOSAL
    (solver.py:754-760).  Unbounded geometries never stop.
    """
    kind = geom.kind

    def fn(X, X_prop):
        if kind in ("unbounded", "unbounded_square"):
            return jnp.ones(X.shape[0], dtype=bool)
        if kind == "sphere":
            return (jnp.sqrt(jnp.sum(X * X, axis=-1))
                    < geom.boundary_distance)
        if kind == "two_spheres":
            r = jnp.sqrt(jnp.sum(X * X, axis=-1))
            return ((r > geom.boundary_distance_1)
                    & (r < geom.boundary_distance_2))
        if kind == "square":
            if geom.one_boundary:
                return jnp.all(X_prop <= geom.X_r, axis=-1)
            return jnp.all((X_prop >= geom.X_l) & (X_prop <= geom.X_r),
                           axis=-1)
        if kind == "square-corner":
            return jnp.any(X_prop <= geom.X_r, axis=-1)
        raise ValueError(kind)

    return fn


def inside_fn_cols(geom: Geometry):
    """Column-layout (d, K) variant of :func:`inside_fn` for the
    transposed stopped rollout (rollout/sde.py: stopped_rollout_dk) —
    identical semantics, reductions over axis 0."""
    kind = geom.kind

    def fn(XT, XT_prop):
        if kind in ("unbounded", "unbounded_square"):
            return jnp.ones(XT.shape[1], dtype=bool)
        if kind == "sphere":
            return (jnp.sqrt(jnp.sum(XT * XT, axis=0))
                    < geom.boundary_distance)
        if kind == "two_spheres":
            r = jnp.sqrt(jnp.sum(XT * XT, axis=0))
            return ((r > geom.boundary_distance_1)
                    & (r < geom.boundary_distance_2))
        if kind == "square":
            if geom.one_boundary:
                return jnp.all(XT_prop <= geom.X_r, axis=0)
            return jnp.all((XT_prop >= geom.X_l) & (XT_prop <= geom.X_r),
                           axis=0)
        if kind == "square-corner":
            return jnp.any(XT_prop <= geom.X_r, axis=0)
        raise ValueError(kind)

    return fn
