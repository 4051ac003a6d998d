"""Estimator training data straight from the simulator.

The reference trains AdaPose on offline data dumped by ``train=collect``
(pickles of views + gt). Because our renderer also produces world-position
maps and the gt part pose is known analytically, supervision is exact and can
be generated on the fly: for each sampled view pair we compute per-point

  - gt NOCS:  part-local coordinates normalized by the part-bbox diagonal
  - gt depth: distance along the camera forward axis (renderer Depth)
  - gt pose:  rotation/translation of the NOCS frame in camera-cv coordinates
              and the NOCS extents (for the direct-regression heads)

matching the solve conventions in ``adapose.py`` (size = 2*max|nocs|*scale,
scale = bbox diagonal; reference interface_v5.py:354-374).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.preprocess import depth_hypotheses, prepare_model_input
from ...utils.transform import Pose, lookat_quat, quat_to_matrix

_CV_FROM_CAM = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])


class SimViewSampler:
    """Samples labelled view pairs from a running VecManipulationEnv."""

    def __init__(self, env, img_size: int = 224, n_pts: int = 1024, seed: int = 0,
                 pose_min=(-0.3, -0.3, 0.4), pose_max=(0.3, 0.3, 1.0),
                 reuse: int = 8, buffer_size: int = 32,
                 d_min: float = 0.1, d_interval: float = 0.1, n_depth: int = 24,
                 view_aug: str = "box"):
        self.env = env
        self.img_size = img_size
        self.n_pts = n_pts
        # "box" = the collection distribution (independent positions in the
        # policy box, exact handle lookat). "wide" = strong view
        # augmentation toward the deployed RL scheduler's distribution
        # (r4 diagnosis, docs/RESULTS.md: the estimator collapses on the
        # policy's late close-in pairs — 8.6 cm step-4 pair error vs 3.1 at
        # step 2): correlated consecutive-view pairs with log-uniform
        # baselines, off-center handle framing (lookat jitter), close-in
        # position bias, and 10% duplicated quasi-monocular pairs.
        self.view_aug = str(view_aug)
        self._pair_anchor = None
        # depth-hypothesis grid MUST match the estimator the batches train
        # (the depth head classifies over exactly these bins)
        self.d_min, self.d_interval, self.n_depth = d_min, d_interval, n_depth
        self.rng = np.random.default_rng(seed)
        self.key = jax.random.PRNGKey(seed)
        self.pose_min = np.asarray(pose_min)
        self.pose_max = np.asarray(pose_max)
        # Render replay buffer: rendering is host-serial (this box exposes a
        # single CPU core) while the train step runs on TPU, so fresh scene
        # renders are the throughput bottleneck. Mirroring the reference's
        # offline regime (it trains on a fixed dataset dumped by
        # train=collect), each rendered view pair is reused ``reuse`` times
        # with FRESH per-point sampling (new choose indices + labels) —
        # only 1 in ``reuse`` batches pays the render cost. reuse=1
        # disables buffering.
        self.reuse = max(1, int(reuse))
        self.buffer_size = int(buffer_size)
        self._buffer: list = []
        self._calls = 0

    def _random_views(self):
        """Teleport the wrist camera toward the handle; return render dict."""
        n = self.env.num_envs
        gt = self.env.handle_bbox()
        target = (gt[:, 0] + gt[:, 6]) / 2
        robot_root = self.env.robot_pose()[:, :3]
        pos = self.rng.uniform(self.pose_min, self.pose_max, size=(n, 3))
        look_target = target - robot_root
        if self.view_aug == "wide":
            close = self.rng.random(n) < 0.35
            # close-in bias: the policy's late views sit at the near-object
            # edge of its box; pull x toward pose_max[0]
            pos[close, 0] = self.rng.uniform(
                (self.pose_min[0] + self.pose_max[0]) / 2, self.pose_max[0],
                size=int(close.sum()))
            if self._pair_anchor is not None:
                corr = self.rng.random(n) < 0.5
                # correlated consecutive-view pair: |delta| log-uniform
                # 3 cm .. 50 cm around the previous view's position
                mag = np.exp(self.rng.uniform(np.log(0.03), np.log(0.5),
                                              size=(n, 1)))
                d = self.rng.normal(size=(n, 3))
                d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
                cand = np.clip(self._pair_anchor + d * mag,
                               self.pose_min, self.pose_max)
                pos[corr] = cand[corr]
            # off-center handle framing: the policy's lookat is an action,
            # not a handle fixation
            look_target = look_target + self.rng.normal(0.0, 0.08, (n, 3))
            self._pair_anchor = pos.copy()
        look = look_target - pos
        q = lookat_quat(look)
        self.env.cam_move_to(np.concatenate([pos, q], -1), time=2, wait=0.5,
                             planner="path", robot_frame=True, skip_move=True,
                             no_collision_with_front=False)
        img = self.env.get_image()["camera0"]
        return img

    def _part_frames(self):
        """Per-env (part pose, local center, local extents, diagonal)."""
        out = []
        for e in range(self.env.num_envs):
            mn, mx = self.env.pool.part_aabb(e, self.env.obj_art[e],
                                             self.env.part_link[e], 129)
            link7 = self.env.pool.link_pose(e, self.env.obj_art[e],
                                            self.env.part_link[e])
            center = (mn + mx) / 2
            ext = mx - mn
            out.append((Pose(link7[:3], link7[3:]), center, ext,
                        float(np.linalg.norm(ext)) + 1e-9))
        return out

    def _labels_for_view(self, img, pts2d, frames=None):
        """Per-point NOCS/depth labels + per-env pose labels for one view.
        ``frames`` must be the part frames captured at render time (the env
        may have been re-randomized since when replaying buffered views)."""
        if frames is None:
            frames = self._part_frames()
        n, N = pts2d.shape[:2]
        H, W = img["Depth"].shape[1:3]
        px = np.clip(np.round(pts2d[..., 0]).astype(int), 0, W - 1)
        py = np.clip(np.round(pts2d[..., 1]).astype(int), 0, H - 1)
        nocs = np.zeros((n, N, 3), np.float32)
        depth = np.zeros((n, N), np.float32)
        R_lab = np.zeros((n, 3, 3), np.float32)
        t_lab = np.zeros((n, 3), np.float32)
        s_lab = np.zeros((n, 3), np.float32)
        for e in range(n):
            world = img["Position"][e][py[e], px[e]]          # (N, 3)
            depth[e] = img["Depth"][e][py[e], px[e]]
            part, center, ext, diag = frames[e]
            local = part.inv().transform_points(world.astype(np.float64))
            # clip: mask-resize aliasing can select pixels just off the part
            # (e.g. door surface behind the handle); tanh range is [-1, 1]
            nocs[e] = np.clip((local - center) / diag, -1.0, 1.0).astype(np.float32)
            # camera-cv pose of the NOCS frame
            E = img["Extrinsic"][e]
            Rp = quat_to_matrix(part.q)
            R_lab[e] = (E[:3, :3] @ Rp).astype(np.float32)
            c_world = part.transform_points(center[None])[0]
            t_lab[e] = (E[:3, :3] @ c_world + E[:3, 3]).astype(np.float32)
            s_lab[e] = (ext / diag).astype(np.float32)
        return nocs, depth, R_lab, t_lab, s_lab

    _KEEP = ("Color", "Depth", "Position", "Mask", "Intrinsic", "Extrinsic")

    def _render_entry(self) -> Optional[tuple]:
        """Render one fresh view pair (resets envs) -> buffered entry."""
        self.env.reset()
        self._pair_anchor = None  # view 1 always samples fresh
        img1 = self._random_views()
        if self.view_aug == "wide" and self.rng.random() < 0.1:
            # duplicated quasi-monocular pair: deployment estimates from a
            # lone valid view duplicated into both stereo slots
            img2 = img1
        else:
            img2 = self._random_views()
        if img1["Mask"].sum() == 0 or img2["Mask"].sum() == 0:
            return None
        frames = self._part_frames()

        def slim(im):
            out = {k: im[k] for k in self._KEEP}
            # halve the buffer's RAM: RGB precision is immaterial for
            # training images (Position/Depth keep f32 — they are labels)
            out["Color"] = np.asarray(im["Color"], np.float16)
            return out

        return (slim(img1), slim(img2), frames)

    def sample_batch(self) -> Optional[Dict]:
        """One labelled training batch. Renders a fresh view pair every
        ``reuse``-th call; otherwise replays a buffered render with fresh
        point sampling and labels."""
        self._calls += 1
        fresh = (self.reuse == 1 or not self._buffer
                 or (self._calls % self.reuse) == 1)
        if fresh:
            entry = self._render_entry()
            if entry is None:
                return None
            self._buffer.append(entry)
            if len(self._buffer) > self.buffer_size:
                self._buffer.pop(int(self.rng.integers(len(self._buffer) - 1)))
        else:
            entry = self._buffer[int(self.rng.integers(len(self._buffer)))]
        img1, img2, frames = entry
        # Preprocess on the HOST CPU backend: shipping the raw 640x480 batch
        # to the accelerator costs ~60 MB per view pair per step through the
        # tunnel (measured as the dominant fixed cost of a train step — the
        # render replay amortized everything else); prepping here means only
        # the img_size^2 crops (+ points/labels) ever cross to the device,
        # inside trainer.step. Keys stay host-side (numpy) so no input is
        # committed to the accelerator.
        try:
            cpu = jax.devices("cpu")[0]
            ctx = jax.default_device(cpu)
        except RuntimeError:  # no cpu backend registered: prep on default
            import contextlib
            ctx = contextlib.nullcontext()
        with ctx:
            keys = jax.random.split(jnp.asarray(np.asarray(self.key)), 3)
            self.key, k1, k2 = np.asarray(keys[0]), keys[1], keys[2]
            K = jnp.asarray(img1["Intrinsic"])
            c1, choose1, pts2d1, newK1, ok1 = prepare_model_input(
                jnp.asarray(img1["Color"], jnp.float32),
                jnp.asarray(img1["Mask"]), K, k1, self.img_size, self.n_pts)
            c2, choose2, pts2d2, newK2, ok2 = prepare_model_input(
                jnp.asarray(img2["Color"], jnp.float32),
                jnp.asarray(img2["Mask"]), K, k2, self.img_size, self.n_pts)
        ok = np.asarray(ok1 & ok2)
        if not ok.any():
            return None
        pts2d1_np = np.asarray(pts2d1)
        pts2d2_np = np.asarray(pts2d2)
        nocs1, depth1, r1, t1, s1 = self._labels_for_view(img1, pts2d1_np, frames)
        nocs2, depth2, r2, t2, s2 = self._labels_for_view(img2, pts2d2_np, frames)

        def proj(newK, ext):
            P = np.tile(np.eye(4, dtype=np.float32), (len(ext), 1, 1))
            P[:, :3, :] = np.einsum("bij,bjk->bik", np.asarray(newK),
                                    ext[:, :3, :].astype(np.float32))
            return P

        B = self.env.num_envs
        # numpy (uncommitted) values: the crops were computed on the CPU
        # backend above, and committed-CPU inputs would pin trainer.step's
        # jit off the accelerator
        batch = {
            "img1": np.asarray(c1), "img2": np.asarray(c2),
            "choose1": np.asarray(choose1), "choose2": np.asarray(choose2),
            "P1": proj(newK1, img1["Extrinsic"]),
            "P2": proj(newK2, img2["Extrinsic"]),
            "depth_values": np.asarray(
                depth_hypotheses(B, self.d_min, self.d_interval,
                                 self.n_depth)),
            "nocs1": nocs1, "nocs2": nocs2,
            "depth1": depth1, "depth2": depth2,
            "r1": r1, "r2": r2, "t1": t1, "t2": t2, "s1": s1, "s2": s2,
            "valid": ok,
        }
        return batch


class PolicyViewSampler(SimViewSampler):
    """DAgger-style view source: train on the views a trained RL camera
    scheduler actually visits instead of the collection box.

    Motivation (measured, r3 — docs/RESULTS.md "RL + AdaPose flagship"):
    the scheduler reaches 95.8% success with gt poses and the estimator
    reaches 88.5% on heuristic/collection views, but jointly they score
    58.7% — the policy's visited viewpoints (3.1-3.25 m of camera travel
    vs the heuristic's 2.04 m) are out-of-distribution for a
    collection-trained estimator. The reference sidesteps this with a
    converged view-robust checkpoint (its train.py:396-410 trains the
    scheduler against the frozen released AdaPose); here the estimator
    is trained in-framework, so we close the loop from the data side:
    each fresh render runs one policy episode (teleported camera moves,
    no manipulation) and yields the policy's LAST TWO views — exactly
    the pair ``ControlInterface.get_estimation`` feeds the estimator at
    deployment. ``mix`` keeps a fraction of collection-box pairs so the
    estimator does not forget the heuristic distribution.
    """

    def __init__(self, env, cfg, policy_ckpt: str, mix: float = 0.5,
                 noise: float = 0.15, pair_mode: str = "last", **kw):
        super().__init__(env, **kw)
        import copy
        from ..controller.rl_pose import ControlInterface
        from .groundtruth_estimator import GroundTruthPoseEstimator
        from ...algo.ppo import PPO

        ctrl_cfg = copy.deepcopy(cfg["controller"])
        # view sampling must never trigger manipulation mid-episode.
        # ControlInterface reads rewards from the GROUP-level dict
        # (rl_pose.py: reward_cfg = cfg['controller']['reward']), so the
        # override must land there — not in the nested 'controller:' dict.
        ctrl_cfg.setdefault("reward", {})["success_coef"] = 0.0
        gt_est = GroundTruthPoseEstimator(env, {}, None)
        iface_cfg = {"controller": ctrl_cfg, "task": cfg.get("task", {})}
        self._iface = ControlInterface(env, gt_est, None, iface_cfg)
        self._ppo = PPO(self._iface, ctrl_cfg, seed=int(kw.get("seed", 0)))
        self._ppo.load(policy_ckpt)
        self.mix = float(mix)
        self.noise = float(noise)
        self.pair_mode = str(pair_mode)

    def _grab(self):
        return self.env.get_image()["camera0"]

    def _render_entry(self):
        if self.rng.random() < self.mix:
            return super()._render_entry()
        iface = self._iface
        obs = iface.reset()  # env.reset + canonical initial view
        shots = [self._grab()]
        for _ in range(iface.max_steps - 1):
            act = self._ppo.act_inference(obs)
            if self.noise > 0:
                act = act + self.rng.normal(0.0, self.noise, act.shape)
            obs, _r, done, _info = iface.step(act, eval=False)
            shots.append(self._grab())
            if np.asarray(done).all():
                break
        if self.pair_mode == "any" and self.rng.random() < 0.1:
            # zero-baseline duplicate pair (10%): deployment estimates from a
            # DUPLICATED view when only one policy view frames the part (the
            # reference's first/second_view_idx clip to the same index at
            # available_num==1 and its k=1 ViewNum row is 71.1%) — train the
            # quasi-monocular regression path the same way.
            j = len(shots) - 1 if len(shots) < 2 else \
                int(self.rng.integers(1, len(shots)))
            img1 = img2 = shots[j]
        elif self.pair_mode == "any" and len(shots) > 2:
            # Sample among ALL consecutive view pairs the policy visits,
            # weighted toward late pairs: deployment's final estimate uses
            # the last pair, but the ViewNum ablation (early_stop=k)
            # evaluates every prefix, and per-step estimates feed the
            # reward at every step — training only on the final pair
            # leaves the earlier pairs out-of-distribution.
            n_pairs = len(shots) - 1
            w = np.arange(1, n_pairs + 1, dtype=np.float64)
            j = int(self.rng.choice(n_pairs, p=w / w.sum()))
            img1, img2 = shots[j], shots[j + 1]
        else:
            img1, img2 = shots[-2], shots[-1]
        if img1["Mask"].sum() == 0 or img2["Mask"].sum() == 0:
            return None
        frames = self._part_frames()

        def slim(im):
            out = {k: im[k] for k in self._KEEP}
            out["Color"] = np.asarray(im["Color"], np.float16)
            return out

        return (slim(img1), slim(img2), frames)
