"""scldm-tpu: TPU-native latent diffusion models for single-cell gene expression.

A from-scratch JAX/Flax/Pallas rebuild of the capabilities of czi-ai/scldm
(reference mounted at /root/reference), designed TPU-first:

- A fully transformer-based set-VAE for exchangeable gene-count tokens with a
  Multi-head Cross-Attention Block (MCAB) pooling encoder and an equivariant
  unpooling decoder (reference: src/scldm/vae.py, nnets.py, layers.py).
- A latent diffusion model trained with the SiT flow-matching loss over linear
  interpolants, a DiT denoiser with adaLN-zero conditioning, classifier-free
  guidance, and ODE/SDE integrators as `lax.scan`/`lax.while_loop` programs
  (reference: src/scldm/transport/, nnets.py:216-492).
- Data-parallel training over a `jax.sharding.Mesh`, orbax checkpointing, a
  sharded-h5ad data pipeline, and Pallas TPU kernels on hot paths.
"""

__version__ = "0.5.0"

from scldm_tpu import constants  # noqa: F401
