from scldm_tpu.config.loader import load_config, merge_overrides, resolve  # noqa: F401
