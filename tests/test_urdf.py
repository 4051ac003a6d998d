"""URDF loader tests: parse -> spec -> C++ sim build -> FK / seg parity."""

import os

import numpy as np
import pytest

from rgbmanip_tpu.assets.urdf import load_urdf
from rgbmanip_tpu.assets.spec import J_FIXED, J_PRISMATIC, J_REVOLUTE
from rgbmanip_tpu.sim.pool import SimPool

CABINET_URDF = """<?xml version="1.0"?>
<robot name="mini_cabinet">
  <link name="base">
    <collision>
      <origin xyz="0 0 0.3"/>
      <geometry><box size="0.4 0.4 0.6"/></geometry>
    </collision>
  </link>
  <link name="door">
    <collision>
      <origin xyz="0 0.19 0"/>
      <geometry><box size="0.02 0.38 0.56"/></geometry>
    </collision>
  </link>
  <link name="handle">
    <collision>
      <origin xyz="0.03 0 0"/>
      <geometry><cylinder radius="0.01" length="0.1"/></geometry>
    </collision>
  </link>
  <link name="knob">
    <visual>
      <geometry><sphere radius="0.02"/></geometry>
    </visual>
  </link>
  <joint name="door_hinge" type="revolute">
    <parent link="base"/>
    <child link="door"/>
    <origin xyz="0.2 -0.2 0.3"/>
    <axis xyz="0 0 1"/>
    <limit lower="0" upper="1.57"/>
    <dynamics damping="0.5" friction="0.1"/>
  </joint>
  <joint name="handle_mount" type="fixed">
    <parent link="door"/>
    <child link="handle"/>
    <origin xyz="0.02 0.33 0" rpy="0 1.5707963 0"/>
  </joint>
  <joint name="knob_mount" type="fixed">
    <parent link="handle"/>
    <child link="knob"/>
    <origin xyz="0 0 0.06"/>
  </joint>
</robot>
"""


@pytest.fixture()
def urdf_path(tmp_path):
    p = tmp_path / "mini_cabinet.urdf"
    p.write_text(CABINET_URDF)
    return str(p)


def test_parse_structure(urdf_path):
    spec = load_urdf(urdf_path, visual_ids={"handle": 129, "door": 128},
                     use_visual_as_collision=True)
    names = [l.name for l in spec.links]
    assert names[0] == "base"
    assert set(names) == {"base", "door", "handle", "knob"}
    # parents precede children
    for i, l in enumerate(spec.links):
        assert l.parent < i
    door = spec.links[spec.link_index("door")]
    assert door.joint_type == J_REVOLUTE
    assert (door.lo, door.hi) == (0.0, 1.57)
    assert door.damping == 0.5 and door.friction == pytest.approx(0.1)
    assert spec.dof() == 1
    handle = spec.links[spec.link_index("handle")]
    assert handle.joint_type == J_FIXED
    assert handle.shapes[0].visual_id == 129
    # visual-only link promoted to collision shape
    knob = spec.links[spec.link_index("knob")]
    assert len(knob.shapes) == 1 and knob.shapes[0].collide


def test_build_and_fk(urdf_path):
    spec = load_urdf(urdf_path, visual_ids={"handle": 129},
                     use_visual_as_collision=True)
    pool = SimPool(1)
    art = pool.build_articulation(0, spec, np.array([0, 0, 0, 1, 0, 0, 0.0]))
    assert pool.art_dof(0, art) == 1

    handle_idx = pool.link_index(0, art, "handle")
    p_closed = pool.link_pose(0, art, handle_idx)
    # door closed: handle at hinge origin + door-local (0.02, 0.33, 0)
    np.testing.assert_allclose(p_closed[:3], [0.22, 0.13, 0.3], atol=1e-6)

    # open the door by 1.5 rad: the hinge (z-axis) swings the handle's
    # door-local offset (0.02, 0.33)
    th = 1.5
    pool.set_qpos(0, art, [th])
    p_open = pool.link_pose(0, art, handle_idx)
    c, s = np.cos(th), np.sin(th)
    exp = [0.2 + 0.02 * c - 0.33 * s, -0.2 + 0.02 * s + 0.33 * c, 0.3]
    np.testing.assert_allclose(p_open[:3], exp, atol=1e-5)

    # segmentation-filtered AABB finds the handle cylinder on the open door
    mn, mx = pool.part_aabb(0, art, handle_idx, 129)
    assert mn is not None
    assert (mx - mn).max() >= 0.1 - 1e-6  # cylinder length along local z


def test_mesh_bounds_hook(tmp_path):
    p = tmp_path / "meshy.urdf"
    p.write_text("""<?xml version="1.0"?>
<robot name="meshy">
  <link name="root">
    <collision>
      <origin xyz="1 0 0"/>
      <geometry><mesh filename="part.obj" scale="2 2 2"/></geometry>
    </collision>
  </link>
</robot>
""")
    seen = {}

    def bounds(path, scale):
        seen["path"] = path
        seen["scale"] = tuple(scale)
        return np.array([0.0, 0.0, 0.5]), np.array([0.1, 0.2, 0.3])

    spec = load_urdf(str(p), mesh_bounds=bounds)
    assert seen["path"].endswith("part.obj") and seen["scale"] == (2.0, 2.0, 2.0)
    s = spec.links[0].shapes[0]
    np.testing.assert_allclose(s.params, (0.1, 0.2, 0.3))
    np.testing.assert_allclose(s.local[:3], (1.0, 0.0, 0.5))

    # without a hook the mesh is skipped
    spec2 = load_urdf(str(p))
    assert spec2.links[0].shapes == []
