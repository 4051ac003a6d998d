"""Hydra-compatible config composition without the hydra dependency.

The reference drives experiments as
``python train.py dataset=… task=… pose_estimator=… manipulation=… controller=… train=…``
via Hydra config groups (reference ``train.py:412-416``, ``cfg/config.yaml:1-12``).
This module reproduces those semantics over plain YAML: a root config names
defaults per group; CLI arguments either swap a group (``task=open_pot``) or
override a leaf with a dotted path (``task.num_envs=4``). The composed result
is a plain nested dict.
"""

from __future__ import annotations

import copy
import os
from typing import Any, Dict, List

import yaml

CFG_ROOT = os.path.join(os.path.dirname(__file__), "cfg")
GROUPS = ("dataset", "task", "pose_estimator", "manipulation", "controller", "train")


class ConfigError(ValueError):
    pass


def _load_yaml(path: str) -> Dict[str, Any]:
    if not os.path.exists(path):
        raise ConfigError(f"config file not found: {path}")
    with open(path) as f:
        return yaml.safe_load(f) or {}


def _parse_value(text: str) -> Any:
    """Parse a CLI override value with YAML scalar rules."""
    return yaml.safe_load(text)


def _set_dotted(cfg: Dict[str, Any], dotted: str, value: Any) -> None:
    keys = dotted.split(".")
    node = cfg
    for k in keys[:-1]:
        if k not in node or not isinstance(node[k], dict):
            node[k] = {}
        node = node[k]
    node[keys[-1]] = value


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply CLI overrides with Hydra's two-phase semantics: ALL group
    selections (``controller=rl``) first, then ALL dotted value overrides
    (``controller.learn.save_dir=...``) — regardless of CLI order. A
    trailing group swap must not silently drop an earlier dotted override
    into the same group (that exact foot-gun cost a training run)."""
    cfg = copy.deepcopy(cfg)
    dotted: List[tuple] = []
    for ov in overrides:
        if "=" not in ov:
            raise ConfigError(f"override must be key=value, got {ov!r}")
        key, _, val = ov.partition("=")
        if key in GROUPS:
            group_file = os.path.join(CFG_ROOT, key, f"{val}.yaml")
            cfg[key] = _load_yaml(group_file)
        else:
            dotted.append((key, val))
    for key, val in dotted:
        _set_dotted(cfg, key, _parse_value(val))
    return cfg


def load_config(overrides: List[str] | None = None, cfg_root: str | None = None) -> Dict[str, Any]:
    """Compose root defaults + group files + CLI overrides into one dict."""
    global CFG_ROOT
    if cfg_root is not None:
        CFG_ROOT = cfg_root
    root = _load_yaml(os.path.join(CFG_ROOT, "config.yaml"))
    defaults = root.pop("defaults", {})
    cfg: Dict[str, Any] = dict(root)
    for group in GROUPS:
        name = defaults.get(group)
        if name is None:
            cfg[group] = None
            continue
        cfg[group] = _load_yaml(os.path.join(CFG_ROOT, group, f"{name}.yaml"))
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    # group selections without files resolve to None; demand explicit choice
    for group in GROUPS:
        if cfg.get(group) is None:
            raise ConfigError(f"config group '{group}' unset — pass {group}=<name>")
    return cfg


def save_config(cfg: Dict[str, Any], path: str) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, sort_keys=False)
