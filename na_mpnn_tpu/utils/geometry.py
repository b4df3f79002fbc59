"""Geometry utilities: planar angles, dihedrals, local frames, triple product.

JAX equivalents of the reference torch helpers (reference geometry.py:5-110),
used by structure-building and analysis code.
"""
from __future__ import annotations

import jax.numpy as jnp


def get_ang(a, b, c, eps: float = 1e-8):
    """Planar angle at b formed by points a-b-c ([..., 3] each) -> radians."""
    v = a - b
    w = c - b
    v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)
    w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + eps)
    # atan2 formulation is stable near 0 and pi (unlike acos of the dot).
    y = jnp.linalg.norm(jnp.cross(v, w), axis=-1)
    x = jnp.sum(v * w, axis=-1)
    return jnp.arctan2(y, x)


def get_dih(a, b, c, d, eps: float = 1e-8):
    """Dihedral angle around the b-c axis for points a-b-c-d -> radians."""
    b0 = a - b
    b1 = c - b
    b2 = d - c
    b1 = b1 / (jnp.linalg.norm(b1, axis=-1, keepdims=True) + eps)
    v = b0 - jnp.sum(b0 * b1, axis=-1, keepdims=True) * b1
    w = b2 - jnp.sum(b2 * b1, axis=-1, keepdims=True) * b1
    x = jnp.sum(v * w, axis=-1)
    y = jnp.sum(jnp.cross(b1, v) * w, axis=-1)
    return jnp.arctan2(y, x)


def get_frames(n, ca, c, eps: float = 1e-8):
    """Orthonormal residue frames from backbone N/CA/C ([..., 3] each)
    -> rotation matrices [..., 3, 3] with rows (x, y, z)."""
    v1 = c - ca
    v2 = n - ca
    e1 = v1 / (jnp.linalg.norm(v1, axis=-1, keepdims=True) + eps)
    u2 = v2 - jnp.sum(e1 * v2, axis=-1, keepdims=True) * e1
    e2 = u2 / (jnp.linalg.norm(u2, axis=-1, keepdims=True) + eps)
    e3 = jnp.cross(e1, e2)
    return jnp.stack([e1, e2, e3], axis=-2)


def triple_prod(a, b, c):
    """Scalar triple product a . (b x c) over the last axis."""
    return jnp.sum(a * jnp.cross(b, c), axis=-1)
