from .loader import load_config, apply_overrides, ConfigError

__all__ = ["load_config", "apply_overrides", "ConfigError"]
