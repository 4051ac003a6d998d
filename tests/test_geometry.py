"""Geometry ops unit tests (umeyama, RANSAC, triangulation, PnP, scale)."""

import jax
import jax.numpy as jnp
import numpy as np

from rgbmanip_tpu.ops import geometry as G
from rgbmanip_tpu.utils.transform import quat_to_matrix

RNG = np.random.default_rng(3)


def random_rotation():
    q = RNG.normal(size=4)
    q /= np.linalg.norm(q)
    return quat_to_matrix(q)


def test_umeyama_exact():
    R = random_rotation()
    s, t = 1.7, np.array([0.3, -0.2, 0.5])
    src = RNG.normal(size=(50, 3))
    tgt = s * src @ R.T + t
    s2, R2, t2 = G.umeyama(jnp.array(src), jnp.array(tgt))
    np.testing.assert_allclose(float(s2), s, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-5)


def test_ransac_umeyama_with_outliers():
    R = random_rotation()
    s, t = 0.8, np.array([-0.1, 0.4, 0.2])
    src = RNG.normal(size=(200, 3))
    tgt = s * src @ R.T + t
    out_idx = RNG.choice(200, 60, replace=False)
    tgt[out_idx] += RNG.normal(size=(60, 3)) * 2.0
    s2, R2, t2, valid = G.ransac_umeyama(
        jnp.array(src), jnp.array(tgt), jax.random.PRNGKey(0))
    assert bool(valid)
    np.testing.assert_allclose(float(s2), s, rtol=0.05)
    np.testing.assert_allclose(np.asarray(R2), R, atol=0.05)
    np.testing.assert_allclose(np.asarray(t2), t, atol=0.1)


def test_compute_scale():
    nocs = RNG.uniform(-0.5, 0.5, size=(256, 3))
    scale = 0.23
    cam = nocs * scale + np.array([1, 2, 3.0])
    s = G.compute_scale(jnp.array(cam), jnp.array(nocs), real_dis_cap=10.0)
    np.testing.assert_allclose(float(s), scale, rtol=1e-3)


def _make_camera(eye):
    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    # camera looking toward origin along +z_cv
    z = -np.asarray(eye)
    z = z / np.linalg.norm(z)
    x = np.cross([0, 0, 1.0], z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    Rwc = np.stack([x, y, z])  # world->cam rows
    E = np.eye(4)
    E[:3, :3] = Rwc
    E[:3, 3] = -Rwc @ eye
    return K, E


def project(K, E, pts):
    pc = pts @ E[:3, :3].T + E[:3, 3]
    uv = pc @ K.T
    return uv[:, :2] / uv[:, 2:]


def test_triangulate_dlt():
    pts = RNG.uniform(-0.3, 0.3, size=(40, 3)) + np.array([0, 0, 0])
    K, E1 = _make_camera(np.array([2.0, 0.3, 0.5]))
    _, E2 = _make_camera(np.array([1.5, -1.0, 0.8]))
    P1 = K @ E1[:3]
    P2 = K @ E2[:3]
    uv1 = project(K, E1, pts)
    uv2 = project(K, E2, pts)
    rec = G.triangulate_dlt(jnp.array(uv1), jnp.array(P1), jnp.array(uv2),
                            jnp.array(P2))
    np.testing.assert_allclose(np.asarray(rec), pts, atol=1e-3)


def test_pnp_dlt():
    R = random_rotation()
    t = np.array([0.1, -0.2, 2.0])
    obj = RNG.uniform(-0.3, 0.3, size=(100, 3))
    K = np.array([[400.0, 0, 320], [0, 400, 240], [0, 0, 1]])
    cam_pts = obj @ R.T + t
    uv = cam_pts @ K.T
    uv = uv[:, :2] / uv[:, 2:]
    R2, t2 = G.pnp_dlt(jnp.array(obj), jnp.array(uv), jnp.array(K))
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t2), t, atol=1e-2)


def test_depth_from_nocs_matches():
    scale = 0.4
    nocs = RNG.uniform(-0.5, 0.5, size=(300, 3))
    world = nocs * scale + np.array([0.0, 0.0, 0.2])
    K, E1 = _make_camera(np.array([1.5, 0.2, 0.6]))
    _, E2 = _make_camera(np.array([1.2, -0.9, 0.9]))
    P1 = np.eye(4); P1[:3] = K @ E1[:3]
    P2 = np.eye(4); P2[:3] = K @ E2[:3]
    uv1 = project(K, E1, world)
    uv2 = project(K, E2, world)
    s, ok = G.depth_from_nocs_matches(
        jnp.array(uv1), jnp.array(nocs), jnp.array(P1), jnp.array(E1),
        jnp.array(uv2), jnp.array(nocs), jnp.array(P2), jnp.array(E2),
        jnp.array(K))
    assert bool(ok)
    np.testing.assert_allclose(float(s), scale, rtol=0.05)


def test_masked_median():
    # bisection median converges to the lower median of the masked values
    vals = jnp.array([5.0, 1.0, 3.0, 100.0, 2.0])
    mask = jnp.array([True, True, True, False, True])
    assert abs(float(G.masked_median(vals, mask)) - 2.0) < 1e-4
    # odd count: exact middle
    vals2 = jnp.array([5.0, 1.0, 3.0, 100.0])
    mask2 = jnp.array([True, True, True, False])
    assert abs(float(G.masked_median(vals2, mask2)) - 3.0) < 1e-4
