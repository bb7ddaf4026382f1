from scldm_tpu.transport.factory import create_transport  # noqa: F401
from scldm_tpu.transport.path import GVPCPlan, ICPlan, VPCPlan, expand_t_like_x  # noqa: F401
from scldm_tpu.transport.transport import (  # noqa: F401
    ModelType,
    PathType,
    Sampler,
    Transport,
    WeightType,
)
