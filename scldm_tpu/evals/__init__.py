from scldm_tpu.evals.mmd import (  # noqa: F401
    bray_curtis_kernel,
    mmd_loss,
    rbf_kernel,
    rbf_mmd_median,
    ruzicka_kernel,
    tanimoto_kernel,
    MMD_METRICS,
)
from scldm_tpu.evals.wasserstein import sinkhorn_divergence, wasserstein  # noqa: F401
