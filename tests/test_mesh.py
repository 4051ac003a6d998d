"""Triangle-mesh geometry in the C++ core: OBJ loading, BVH raycast,
sphere contact, planner obstacles (replaces SAPIEN's native mesh pipeline,
reference env/sapien_envs/base_manipulation.py:265-389 +
utils/sapien_utils.py:90-172)."""

import numpy as np
import pytest

from rgbmanip_tpu.assets import panda
from rgbmanip_tpu.assets.objmesh import load_obj, mesh_aabb, register_mesh
from rgbmanip_tpu.assets.spec import (ArticulationSpec, LinkSpec, S_BOX,
                                      S_MESH, ShapeSpec, pose7)
from rgbmanip_tpu.sim.pool import SimPool

HOME = np.array([0, -0.85, 0, -2.8, 0, 2.1, 0.8, 0.04, 0.04])


def cube_mesh(half=0.5, center=(0.0, 0.0, 0.0)):
    """12-triangle cube with OUTWARD winding (winding is irrelevant to the
    core's two-sided tests, but keep it sane)."""
    c = np.asarray(center, np.float64)
    signs = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                      for z in (-1, 1)], np.float64)
    v = c + half * signs
    f = np.array([
        [0, 1, 3], [0, 3, 2],   # -x
        [4, 6, 7], [4, 7, 5],   # +x
        [0, 4, 5], [0, 5, 1],   # -y
        [2, 3, 7], [2, 7, 6],   # +y
        [0, 2, 6], [0, 6, 4],   # -z
        [1, 5, 7], [1, 7, 3],   # +z
    ], np.int32)
    return v, f


def one_shape_art(shape):
    spec = ArticulationSpec()
    spec.links.append(LinkSpec("base", parent=-1, shapes=[shape]))
    return spec


def test_register_and_aabb():
    v, f = cube_mesh(0.3, (0.1, -0.2, 0.5))
    mid = register_mesh(v, f)
    lo, hi, nt = mesh_aabb(mid)
    assert nt == 12
    np.testing.assert_allclose(lo, [-0.2, -0.5, 0.2], atol=1e-12)
    np.testing.assert_allclose(hi, [0.4, 0.1, 0.8], atol=1e-12)


def test_load_obj_fixture():
    import os
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "mobility_cabinet", "handle.obj")
    v, f = load_obj(path)
    assert len(v) >= 8 and len(f) >= 12
    assert f.min() >= 0 and f.max() < len(v)


def test_mesh_raycast_matches_box():
    """Depth/Position/Seg/Normal of a mesh cube must match the analytic box
    to raycaster precision."""
    mid = register_mesh(*cube_mesh(0.4, (0.0, 0.0, 0.0)))
    local = pose7((0, 0, 0.6))
    cam = np.zeros((1, 7))
    cam[0, :3] = [-2.0, 0.0, 0.6]
    cam[0, 3] = 1.0  # +x forward

    outs = []
    for shape in (ShapeSpec(S_BOX, (0.4, 0.4, 0.4), local, visual_id=7),
                  ShapeSpec(S_MESH, (0.4, 0.4, 0.4), local, visual_id=7,
                            mesh=mid)):
        p = SimPool(1)
        p.build_articulation(0, one_shape_art(shape), pose7())
        outs.append(p.render_all(cam, 96, 72))
    box, mesh = outs
    hit_box = box["Seg"][0] == 7
    hit_mesh = mesh["Seg"][0] == 7
    assert hit_box.sum() > 200
    np.testing.assert_array_equal(hit_box, hit_mesh)
    np.testing.assert_allclose(mesh["Depth"][0][hit_box],
                               box["Depth"][0][hit_box], atol=1e-4)
    np.testing.assert_allclose(mesh["Position"][0][hit_box],
                               box["Position"][0][hit_box], atol=1e-3)
    np.testing.assert_allclose(mesh["Norm"][0][hit_box],
                               box["Norm"][0][hit_box], atol=1e-4)


def test_mesh_contact_stops_arm():
    """Contact-stop must halt the arm against a MESH wall exactly as it does
    against the equivalent box wall."""
    finals = []
    for use_mesh in (False, True):
        p = SimPool(1)
        p.set_dt(0, 0.005)
        rob = p.build_articulation(0, panda.panda_spec(), pose7((0, 0, 0.15)))
        p.set_robot(0, rob, p.link_index(0, rob, "panda_hand"), 7)
        p.set_qpos(0, rob, HOME)
        p.set_drive_target(0, rob, HOME)
        local = pose7((0.55, 0.0, 0.55))
        if use_mesh:
            # thin wall: unit cube scaled per-axis via verts
            v, f = cube_mesh(1.0)
            v[:, 0] *= 0.02
            v[:, 1] *= 0.5
            v[:, 2] *= 0.5
            mid = register_mesh(v, f)
            shape = ShapeSpec(S_MESH, (0.02, 0.5, 0.5), local, mesh=mid)
        else:
            shape = ShapeSpec(S_BOX, (0.02, 0.5, 0.5), local)
        obj = p.build_articulation(0, one_shape_art(shape), pose7())
        p.set_grasp_config(0, obj, 0, grasp_vid=129)
        # command the hand straight through the wall
        target = np.array([[0.8, 0.0, 0.4, 0.0, 1.0, 0.0, 0.0]])
        p.exec_ik_move(target, run_steps=500, wait_steps=50)
        finals.append(p.hand_pose(0)[:3])
    box_p, mesh_p = finals
    # both stopped before the wall plane (x=0.53 minus hand clearance)
    assert box_p[0] < 0.56 and mesh_p[0] < 0.56, (box_p, mesh_p)
    np.testing.assert_allclose(mesh_p, box_p, atol=0.02)


def test_mesh_planner_matches_box():
    """The planner must treat a mesh slab exactly like the equivalent box
    slab (exercises the BVH-subtree obstacle boxes): same plan success and
    same final hand pose on a goal that forces obstacle-aware planning."""
    finals = []
    for use_mesh in (False, True):
        p = SimPool(1)
        p.set_dt(0, 0.005)
        rob = p.build_articulation(0, panda.panda_spec(), pose7((0, 0, 0.15)))
        p.set_robot(0, rob, p.link_index(0, rob, "panda_hand"), 7)
        p.set_qpos(0, rob, HOME)
        p.set_drive_target(0, rob, HOME)
        local = pose7((0.45, 0.0, 0.75))
        if use_mesh:
            v, f = cube_mesh(1.0)
            v[:, 0] *= 0.3
            v[:, 1] *= 0.02
            v[:, 2] *= 0.25
            shape = ShapeSpec(S_MESH, (0.3, 0.02, 0.25), local,
                              mesh=register_mesh(v, f))
        else:
            shape = ShapeSpec(S_BOX, (0.3, 0.02, 0.25), local)
        p.build_articulation(0, one_shape_art(shape), pose7())
        target = np.array([[0.45, 0.35, 0.5, 0.0, 1.0, 0.0, 0.0]])
        ok = p.exec_path_move(target, use_wall=False, wait_steps=100,
                              run_steps_fallback=500)
        assert ok[0] == 1
        finals.append(p.hand_pose(0)[:3])
    np.testing.assert_allclose(finals[1], finals[0], atol=0.02)
