from scldm_tpu.sampling.size_factors import SizeFactorSampler  # noqa: F401
