"""Rotation representations: euler / matrix / continuous-6D / quaternion.

Covers utils/rot_utils.py:36-110 and the euler-to-matrix used inside IK
(utils/deform_ik.py:13-43).  jnp-based so the same code runs on device (inside
jit) and on host via numpy inputs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def euler_to_matrix(angles: jax.Array) -> jax.Array:
    """XYZ-intrinsic euler to rotation matrix: R = Rx @ Ry @ Rz, matching the
    composition of deform_ik.py:13-18.  angles (..., 3) -> (..., 3, 3)."""
    x, y, z = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    Rx = jnp.stack([
        one, zero, zero,
        zero, cx, -sx,
        zero, sx, cx,
    ], axis=-1).reshape(angles.shape[:-1] + (3, 3))
    Ry = jnp.stack([
        cy, zero, sy,
        zero, one, zero,
        -sy, zero, cy,
    ], axis=-1).reshape(angles.shape[:-1] + (3, 3))
    Rz = jnp.stack([
        cz, -sz, zero,
        sz, cz, zero,
        zero, zero, one,
    ], axis=-1).reshape(angles.shape[:-1] + (3, 3))
    return Rx @ Ry @ Rz


def matrix_to_euler(R: jax.Array) -> jax.Array:
    """Inverse of euler_to_matrix (R = Rx Ry Rz).  For this composition
    R[0,2] = sin(y): y = asin(R02); x = atan2(-R12, R22); z = atan2(-R01, R00)
    away from gimbal lock; the singular branch pins z = 0."""
    sy = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    y = jnp.arcsin(sy)
    cy = jnp.cos(y)
    singular = jnp.abs(cy) < 1e-6
    x = jnp.where(singular,
                  jnp.arctan2(R[..., 2, 1], R[..., 1, 1]),
                  jnp.arctan2(-R[..., 1, 2], R[..., 2, 2]))
    z = jnp.where(singular, 0.0, jnp.arctan2(-R[..., 0, 1], R[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_6d(R: jax.Array) -> jax.Array:
    """First two columns, concatenated (rot_utils.py:36-37)."""
    return jnp.concatenate([R[..., :, 0], R[..., :, 1]], axis=-1)


def _normalize(v, eps=1e-8):
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), eps)


def sixd_to_matrix(d6: jax.Array) -> jax.Array:
    """Gram-Schmidt continuous-6D to matrix (rot_utils.py:42-56)."""
    a, b = d6[..., :3], d6[..., 3:]
    x = _normalize(a)
    z = _normalize(jnp.cross(x, b))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)


def matrix_to_quaternion(R: jax.Array) -> jax.Array:
    """Rotation matrix to quaternion (x, y, z, w), scipy convention.

    Branch-free Shepperd's method via `where` selection (jit-safe)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    q0 = jnp.stack([m21 - m12, m02 - m20, m10 - m01, 1.0 + tr], -1) / (2.0 * safe_sqrt(1.0 + tr))[..., None]
    q1 = jnp.stack([1.0 + m00 - m11 - m22, m01 + m10, m02 + m20, m21 - m12], -1) / (2.0 * safe_sqrt(1.0 + m00 - m11 - m22))[..., None]
    q2 = jnp.stack([m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21, m02 - m20], -1) / (2.0 * safe_sqrt(1.0 - m00 + m11 - m22))[..., None]
    q3 = jnp.stack([m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22, m10 - m01], -1) / (2.0 * safe_sqrt(1.0 - m00 - m11 + m22))[..., None]

    cond0 = tr > 0
    cond1 = (m00 > m11) & (m00 > m22)
    cond2 = m11 > m22
    q = jnp.where(cond0[..., None], q0,
                  jnp.where(cond1[..., None], q1,
                            jnp.where(cond2[..., None], q2, q3)))
    return _normalize(q)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1).reshape(q.shape[:-1] + (3, 3))
