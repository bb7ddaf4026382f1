from scldm_tpu.ops.distributions import (  # noqa: F401
    log_gaussian,
    log_nb_positive,
    nb_mean,
    nb_sample,
)
from scldm_tpu.ops.transforms import (  # noqa: F401
    COUNT_TRANSFORMS,
    anscombe_transform,
    log1p_transform,
    log1p_zero_transform,
    sqrt_transform,
)
