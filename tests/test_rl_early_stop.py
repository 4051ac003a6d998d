"""The controller.early_stop knob must bound the number of policy steps
(views) taken by RLPoseController.run — the reference reads it from
cfg['controller']['early_stop'] (rl_pose.py:491) and it drives the #views
ablation (miscs/experimental_results/ablation_results.yaml). Regression for
a bug where the knob was silently ignored and every eval used 4 views."""

from rgbmanip_tpu.config import load_config
from rgbmanip_tpu.train import (
    prepare_controller, prepare_env, prepare_manipulation,
    prepare_pose_estimator,
)
from rgbmanip_tpu.utils.logger import get_logger

LOG = get_logger()
LOG.setLevel("WARNING")


def n_policy_steps(early_stop):
    cfg = load_config([
        "controller=rl", f"controller.early_stop={early_stop}",
        "pose_estimator=ground_truth", "task.num_envs=2", "train.total_round=2",
    ])
    env = prepare_env(cfg["task"], cfg["dataset"], log=LOG, seed=0)
    try:
        manip = prepare_manipulation(env, cfg["manipulation"], LOG)
        pe = prepare_pose_estimator(env, cfg["pose_estimator"], LOG)
        ctrl = prepare_controller(env, pe, manip, cfg["controller"], cfg, LOG)
        calls = []
        orig = ctrl.controller.act_inference
        ctrl.controller.act_inference = lambda o: (calls.append(1), orig(o))[1]
        env.reset()
        ctrl.run(eval=True)
        return len(calls)
    finally:
        env.close()


def test_early_stop_bounds_view_count():
    assert n_policy_steps(1) == 1
    assert n_policy_steps(3) == 3
