"""Config composition tests (hydra-compatible group/override semantics)."""

import pytest

from rgbmanip_tpu.config import ConfigError, load_config


def test_defaults_compose():
    cfg = load_config([])
    assert cfg["task"]["name"] == "open_cabinet"
    assert cfg["controller"]["name"] == "heuristic_pose"
    assert cfg["pose_estimator"]["name"] == "ground_truth"
    assert cfg["train"]["name"] == "test"
    assert cfg["task"]["object_conf"]["success_dof"] == [0.15]


def test_group_override():
    cfg = load_config(["task=open_pot", "controller=rl", "dataset=pot_train"])
    assert cfg["task"]["name"] == "open_pot"
    assert cfg["controller"]["learn"]["gamma"] == 0.98
    assert len(cfg["dataset"]["objects"]) == 21


def test_leaf_override():
    cfg = load_config(["task.num_envs=4", "controller=rl", "controller.learn.gamma=0.5"])
    assert cfg["task"]["num_envs"] == 4
    assert cfg["controller"]["learn"]["gamma"] == 0.5


def test_task_variants():
    cfg = load_config(["task=open_cabinet_45"])
    assert cfg["task"]["object_conf"]["success_dof"] == [0.78]
    cfg = load_config(["task=open_cabinet_no_dr"])
    rand = cfg["task"]["object_conf"]["randomization"]
    assert rand["rot"]["low"] == 0.0 and rand["dis"]["low"] == rand["dis"]["high"]


def test_unknown_group_file_raises():
    with pytest.raises(ConfigError):
        load_config(["task=not_a_task"])


def test_dataset_counts():
    for name, count in [("cabinet_train", 39), ("cabinet_test", 17),
                        ("drawer_train", 43), ("mug_train", 35)]:
        cfg = load_config([f"dataset={name}"])
        assert len(cfg["dataset"]["objects"]) == count


def test_dotted_override_survives_later_group_swap():
    """Hydra two-phase semantics: a group selection appearing AFTER a dotted
    override into that group must not drop the override (this exact
    ordering, emitted by scripts/train_rl_chunked.sh, once silently sent a
    training run's checkpoints to the default save_dir)."""
    cfg = load_config([
        "controller.learn.save_dir=saves/custom_dir",
        "controller=rl",
        "dataset=cabinet_train", "task=open_cabinet",
        "manipulation=open_cabinet", "pose_estimator=ground_truth",
        "train=controller",
    ])
    assert cfg["controller"]["learn"]["save_dir"] == "saves/custom_dir"
