"""Unit tests for quaternion/pose math — numpy and JAX backends cross-checked."""

import numpy as np
import pytest

from rgbmanip_tpu.utils import transform as T


def random_quats(n, rng):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


RNG = np.random.default_rng(0)


def test_quat_mul_identity():
    q = random_quats(16, RNG)
    ident = np.tile([1.0, 0, 0, 0], (16, 1))
    np.testing.assert_allclose(T.quat_mul(q, ident), q, atol=1e-12)
    np.testing.assert_allclose(T.quat_mul(ident, q), q, atol=1e-12)


def test_quat_mul_inverse():
    q = random_quats(16, RNG)
    prod = T.quat_mul(q, T.quat_conjugate(q))
    expect = np.tile([1.0, 0, 0, 0], (16, 1))
    np.testing.assert_allclose(prod, expect, atol=1e-12)


def test_quat_rotate_matches_matrix():
    q = random_quats(32, RNG)
    v = RNG.normal(size=(32, 3))
    via_mat = np.einsum("nij,nj->ni", T.quat_to_matrix(q), v)
    np.testing.assert_allclose(T.quat_rotate(q, v), via_mat, atol=1e-10)


def test_matrix_quat_roundtrip():
    q = random_quats(64, RNG)
    q = q * np.where(q[:, :1] < 0, -1.0, 1.0)  # canonical sign
    q2 = T.matrix_to_quat(T.quat_to_matrix(q))
    np.testing.assert_allclose(q2, q, atol=1e-9)


def test_matrix_quat_roundtrip_edge_cases():
    # 180-degree rotations stress every candidate branch
    for axis in np.eye(3):
        q = T.axis_angle_to_quat(axis, np.pi)
        m = T.quat_to_matrix(q)
        q2 = T.matrix_to_quat(m)
        np.testing.assert_allclose(T.quat_to_matrix(q2), m, atol=1e-9)


def test_axis_angle():
    q = T.axis_angle_to_quat(np.array([0.0, 0, 1]), np.pi / 2)
    v = T.quat_rotate(q, np.array([1.0, 0, 0]))
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-8)


def test_lookat_quat_points_x_along_direction():
    dirs = T.normalize(RNG.normal(size=(32, 3)))
    q = T.lookat_quat(dirs)
    x_axis = T.quat_to_axis(q, 0)
    np.testing.assert_allclose(x_axis, dirs, atol=1e-8)
    # y should be horizontal (perpendicular to world z) in the generic case
    y_axis = T.quat_to_axis(q, 1)
    np.testing.assert_allclose(y_axis[:, 2], 0.0, atol=1e-8)


def test_lookat_quat_degenerate():
    for d, expect_x in [([0, 0, 1.0], [0, 0, 1.0]), ([0, 0, -1.0], [0, 0, -1.0])]:
        q = T.lookat_quat(np.array([d]))
        np.testing.assert_allclose(T.quat_to_axis(q, 0)[0], expect_x, atol=1e-8)


def test_frame_quat():
    # rotate the standard frame by a known quaternion, recover it
    q = random_quats(8, RNG)
    basis = np.eye(3)
    rotated = np.stack([T.quat_rotate(q, np.tile(b, (8, 1))) for b in basis], axis=1)
    q_rec = T.frame_quat(np.tile(basis, (8, 1, 1)), rotated)
    for i in range(8):
        np.testing.assert_allclose(
            T.quat_to_matrix(q_rec[i]), T.quat_to_matrix(q[i]), atol=1e-9
        )


def test_pose_compose_inverse():
    a = T.Pose(RNG.normal(size=3), random_quats(1, RNG)[0])
    b = T.Pose(RNG.normal(size=3), random_quats(1, RNG)[0])
    ab = a * b
    ident = ab * ab.inv()
    np.testing.assert_allclose(ident.p, 0, atol=1e-10)
    np.testing.assert_allclose(abs(ident.q[0]), 1, atol=1e-10)
    # matrix path agrees
    np.testing.assert_allclose(
        ab.to_transformation_matrix(),
        a.to_transformation_matrix() @ b.to_transformation_matrix(),
        atol=1e-10,
    )


def test_compute_quat_err_zero():
    q = random_quats(4, RNG)
    np.testing.assert_allclose(T.compute_quat_err(q, q), 0, atol=1e-12)


@pytest.mark.parametrize("fn,args", [
    ("quat_mul", 2), ("quat_conjugate", 1), ("quat_to_matrix", 1),
    ("matrix_to_quat", "m"), ("lookat_quat", "v"), ("quat_rotate", "qv"),
])
def test_jax_backend_matches_numpy(fn, args):
    import jax.numpy as jnp

    from rgbmanip_tpu.ops import transform as JT

    q1 = random_quats(16, RNG)
    q2 = random_quats(16, RNG)
    v = RNG.normal(size=(16, 3))
    if args == 2:
        a, b = getattr(T, fn)(q1, q2), getattr(JT, fn)(jnp.array(q1), jnp.array(q2))
    elif args == 1:
        a, b = getattr(T, fn)(q1), getattr(JT, fn)(jnp.array(q1))
    elif args == "m":
        m = T.quat_to_matrix(q1)
        a, b = getattr(T, fn)(m), getattr(JT, fn)(jnp.array(m))
    elif args == "v":
        a, b = getattr(T, fn)(v), getattr(JT, fn)(jnp.array(v))
    elif args == "qv":
        a, b = getattr(T, fn)(q1, v), getattr(JT, fn)(jnp.array(q1), jnp.array(v))
    np.testing.assert_allclose(np.asarray(b), a, atol=1e-5)
