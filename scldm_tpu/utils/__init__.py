from scldm_tpu.utils.logger import logger  # noqa: F401
