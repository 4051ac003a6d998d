"""simcore (C++ physics/IK/planner/renderer) unit tests."""

import numpy as np
import pytest

from rgbmanip_tpu.assets import panda, procedural
from rgbmanip_tpu.assets.spec import pose7
from rgbmanip_tpu.sim.pool import SimPool
from rgbmanip_tpu.utils.transform import Pose, quat_to_axis

HOME = [0.0, 0.0, 0.0, -0.94, 0.0, 1.12, 0.0, 0.04, 0.04]


@pytest.fixture(scope="module")
def pool():
    p = SimPool(2)
    spec = panda.panda_spec()
    for e in range(2):
        p.set_dt(e, 0.005)
        art = p.build_articulation(e, spec, pose7((0, 0, 0.15)))
        hand = p.link_index(e, art, "panda_hand")
        p.set_robot(e, art, hand, 7)
        p.set_qpos(e, art, HOME)
        p.set_drive_target(e, art, HOME)
    return p


def test_fk_reasonable(pool):
    # at the home-ish pose the hand should be in front of and above the base
    hp = pool.hand_pose(0)
    assert 0.2 < hp[0] < 0.8          # forward
    assert 0.3 < hp[2] < 1.2          # above ground
    assert abs(hp[1]) < 0.05          # centered


def test_qlimits(pool):
    lo, hi = pool.get_qlimits(0, 0)
    assert lo.shape == (9,)
    np.testing.assert_allclose(lo[0], -2.8973)
    np.testing.assert_allclose(hi[7], 0.04)


def test_ik_reaches_target(pool):
    # pick a reachable pose near the workspace center
    target = np.concatenate([[0.45, 0.1, 0.55], [0.0, 1.0, 0.0, 0.0]])  # hand z down-ish
    ok, q = pool.ik(0, np.concatenate([target[:3] - [0, 0, 0.15], target[3:]]))
    assert ok
    # verify FK of the solution matches
    full = np.concatenate([q, [0.04, 0.04]])
    saved = pool.get_qpos(0, 0)
    pool.set_qpos(0, 0, full)
    hp = pool.hand_pose(0)
    np.testing.assert_allclose(hp[:3], target[:3], atol=2e-3)
    pool.set_qpos(0, 0, saved)


def test_pd_tracking(pool):
    pool.set_qpos(0, 0, HOME)
    pool.set_qpos(1, 0, HOME)
    target = np.array(HOME)
    target[0] = 0.5
    acts = np.tile(np.concatenate([target[:7], [0.04]]), (2, 1))
    pool.step_all(acts, drive_mode="pos", n_substeps=400)
    q = pool.get_qpos(0, 0)
    assert abs(q[0] - 0.5) < 0.02


def test_exec_ik_move(pool):
    for e in range(2):
        pool.set_qpos(e, 0, HOME)
        pool.set_drive_target(e, 0, HOME)
    hp0 = pool.hand_pose(0)
    target = np.array([0.45, 0.0, 0.45, 0.0, 1.0, 0.0, 0.0])
    targets = np.tile(target, (2, 1))
    targets[:, 2] -= 0.15  # robot frame (base at z=0.15)
    pool.exec_ik_move(targets, run_steps=400, wait_steps=100)
    hp = pool.hand_pose(0)
    assert np.linalg.norm(hp[:3] - target[:3]) < 0.02, (hp0, hp)


def test_render(pool):
    cam = np.zeros((2, 7))
    cam[:, :3] = [-0.5, 0, 0.8]
    cam[:, 3] = 1.0  # identity: looking +x
    out = pool.render_all(cam, 160, 120)
    assert out["Color"].shape == (2, 120, 160, 3)
    assert out["Depth"].max() > 0          # hit something
    assert (out["Seg"] == 0).all()         # robot + ground are id 0


def test_cabinet_asset_and_grasp():
    p = SimPool(1)
    p.set_dt(0, 0.005)
    spec = panda.panda_spec()
    rob = p.build_articulation(0, spec, pose7((0, 0, 0.15)))
    p.set_robot(0, rob, p.link_index(0, rob, "panda_hand"), 7)
    p.set_qpos(0, rob, HOME)
    p.set_drive_target(0, rob, HOME)

    ospec, meta = procedural.generate("one_door_cabinet", 1234)
    obj = p.build_articulation(0, ospec, pose7((0.85, 0, 0.5)))
    part = p.link_index(0, obj, meta.part_link)
    p.set_grasp_config(0, obj, part, 129)

    # gt handle bbox exists and sits in front of the cabinet (toward robot)
    mn, mx = p.part_aabb(0, obj, part, 129)
    assert mn is not None
    # door-local frame: z = -x_world => handle (standoff +z local) near zmax
    link7 = p.link_pose(0, obj, part)
    lp = Pose(link7[:3], link7[3:])
    center_world = lp.transform_points(((mn + mx) / 2)[None])[0]
    assert center_world[0] < 0.85  # in front of cabinet center (toward robot)

    # drive the hand to the handle and close: grasp engages
    approach = np.array([1.0, 0, 0])
    hand_p = center_world - approach * 0.105
    # gripper x = -z, z = approach
    from rgbmanip_tpu.utils.transform import frame_quat
    q = frame_quat(np.eye(3), np.stack([[0, 0, -1], np.cross(approach, [0, 0, -1.0]), approach]))
    target = np.concatenate([hand_p, q])
    target[2] -= 0.15
    p.exec_ik_move(target[None], run_steps=400, wait_steps=100)
    assert not p.grasped(0)
    p.gripper_toggle(False, steps=40)
    assert p.grasped(0)

    # pulling back opens the door
    dof0 = p.get_qpos(0, obj)[0]
    pull_target = target.copy()
    pull_target[0] -= 0.25
    p.exec_ik_move(pull_target[None], run_steps=400, wait_steps=100)
    dof1 = p.get_qpos(0, obj)[0]
    assert dof1 > dof0 + 0.1, (dof0, dof1)


def test_link_jacobian_finite_difference(pool):
    """J from simcore matches finite-difference FK derivatives."""
    pool.set_qpos(0, 0, HOME)
    hand = 8  # panda_hand link index is whatever set_robot used; re-derive:
    from rgbmanip_tpu.assets import panda as _panda  # noqa: F401
    # use the ee link recorded at fixture setup: link_index of panda_hand
    hand = pool.link_index(0, 0, "panda_hand")
    J = pool.link_jacobian(0, 0, hand)
    dof = pool.art_dof(0, 0)
    assert J.shape == (6, dof)
    eps = 1e-6
    q0 = pool.get_qpos(0, 0)
    p0 = pool.link_pose(0, 0, hand)
    for d in range(7):
        q = q0.copy()
        q[d] += eps
        pool.set_qpos(0, 0, q)
        p1 = pool.link_pose(0, 0, hand)
        # linear velocity rows
        np.testing.assert_allclose(J[:3, d], (p1[:3] - p0[:3]) / eps, atol=1e-4)
        # angular rows: omega = 2 * Im(dq * q0^-1) / eps
        w0, x0, y0, z0 = p0[3:]
        w1, x1, y1, z1 = p1[3:]
        dq = np.array([
            -w1 * x0 + x1 * w0 - y1 * z0 + z1 * y0,
            -w1 * y0 + x1 * z0 + y1 * w0 - z1 * x0,
            -w1 * z0 - x1 * y0 + y1 * x0 + z1 * w0,
        ])
        np.testing.assert_allclose(J[3:, d], 2 * dq / eps, atol=1e-3)
    pool.set_qpos(0, 0, q0)


def test_impedance_controller(pool):
    """Impedance torques pull the effector toward the target and vanish at
    the rest pose (reference impedance_control.py:25-54 semantics)."""
    from rgbmanip_tpu.envs.impedance_control import ImpedanceController

    pool.set_qpos(0, 0, HOME)
    hand = pool.link_index(0, 0, "panda_hand")
    ctl = ImpedanceController(pool, 0, 0, hand)
    q = pool.get_qpos(0, 0)
    dq = np.zeros_like(q)
    cur = pool.link_pose(0, 0, hand)

    # at the target with zero velocity at rest: zero torque
    tau0 = ctl.control_ik(cur, q, q, dq)
    np.testing.assert_allclose(tau0, 0.0, atol=1e-8)

    # target displaced +x: the induced task-space force points toward it
    tgt = cur.copy()
    tgt[0] += 0.1
    tau = ctl.control_ik(tgt, q, q, dq)
    J = pool.link_jacobian(0, 0, hand)[:, :7]
    ee_force_dir = J @ tau  # ~ J J^T Kp dx, positive along +x
    assert ee_force_dir[0] > 0
