"""rgbmanip_tpu: TPU-native rebuild of hyperplane-lab/RGBManip."""

import os


def _honor_jax_platforms_env():
    """Re-assert the JAX_PLATFORMS env var into the jax config.

    The build image's sitecustomize registers the axon TPU plugin and sets
    ``jax_platforms`` to "axon,cpu" via config.update, which silently
    overrides the env var. A CPU-forced run (``JAX_PLATFORMS=cpu``) then
    still initializes the axon client first and blocks forever when the
    TPU tunnel is down. Honoring the env var restores the documented jax
    behavior; runs without the var are untouched.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax
        cfg = jax.config.jax_platforms or ""
        # If the config merely EXTENDS the env var with extra fallback
        # backends (e.g. env "axon" vs config "axon,cpu" — some images set
        # both), the default platform already matches the user's intent and
        # the extra backends are strictly useful (data.py preps batches on
        # the host cpu backend). Only override when the default differs.
        if cfg.split(",")[0] != plat.split(",")[0]:
            jax.config.update("jax_platforms", plat)
    except Exception:
        pass


_honor_jax_platforms_env()
