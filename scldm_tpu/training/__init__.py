from scldm_tpu.training.optim import adamw_legacy, wsd_schedule  # noqa: F401
from scldm_tpu.training.ema import EMAState, ema_init, ema_update  # noqa: F401
