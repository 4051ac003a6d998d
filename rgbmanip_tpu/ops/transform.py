"""Batched quaternion / rigid-transform math, JAX edition (device-side).

jit/vmap-friendly mirror of ``rgbmanip_tpu.utils.transform`` (numpy) for use
inside jitted reward computation, pose-estimation postprocessing, and PPO
observation assembly. Branch-free (lax.select / where only) so everything
traces under ``jax.jit`` with static shapes.

Quaternion convention: ``(w, x, y, z)`` scalar-first.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-9


def normalize(x, eps: float = EPS):
    return x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + eps)


def quat_mul(q1, q2):
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 + y1 * w2 + z1 * x2 - x1 * z2,
            w1 * z2 + z1 * w2 + x1 * y2 - y1 * x2,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    return jnp.concatenate([q[..., :1], -q[..., 1:]], axis=-1)


def quat_rotate(q, v):
    qv = q[..., 1:]
    qw = q[..., :1]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_to_matrix(q):
    q = normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(m):
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    q0 = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    q1 = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    q2 = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    q3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)
    lead = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    idx = jnp.argmax(lead, axis=-1)
    cands = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32).repeat(4, -1), axis=-2)[..., 0, :]
    q = normalize(q)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def axis_angle_to_quat(axis, angle):
    axis = normalize(axis)
    angle = jnp.asarray(angle)[..., None]
    half = angle / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_to_axis(q, axis_id: int):
    return quat_to_matrix(q)[..., :, axis_id]


def compute_quat_err(targ, curr):
    q_r = quat_mul(targ, quat_conjugate(curr))
    return q_r[..., 1:4] * jnp.sign(q_r[..., :1] + EPS)


def frame_quat(from_vs, to_vs):
    """Quaternion rotating row-stacked orthonormal frame ``from_vs`` -> ``to_vs``."""
    R = jnp.swapaxes(to_vs, -1, -2) @ from_vs
    return matrix_to_quat(R)


def lookat_quat(direction):
    """Camera quaternion whose +x axis looks along ``direction`` (…, 3)."""
    d = normalize(direction)
    z_ = jnp.array([0.0, 0.0, 1.0])
    dot = (d * z_).sum(-1)
    generic = (jnp.abs(jnp.abs(dot) - 1.0) >= 1e-6)[..., None]

    y = jnp.cross(jnp.broadcast_to(z_, d.shape), d)
    y = jnp.where(generic, normalize(y), jnp.array([0.0, 1.0, 0.0]))
    x = jnp.where(generic, d, jnp.where(dot[..., None] > 0, z_, -z_))
    z = normalize(jnp.cross(x, y))
    R = jnp.stack([x, y, z], axis=-1)
    return matrix_to_quat(R)


def pose_mul(p1, q1, p2, q2):
    """Compose rigid transforms given as (pos, quat) arrays."""
    return p1 + quat_rotate(q1, p2), quat_mul(q1, q2)


def pose_inv(p, q):
    qi = quat_conjugate(q)
    return -quat_rotate(qi, p), qi
