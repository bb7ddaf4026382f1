from scldm_tpu.nn.layers import (  # noqa: F401
    Block,
    CrossAttention,
    CrossAttentionBlock,
    FinalLayerDiT,
    InputTransformerVAE,
    MLP,
    SelfAttention,
    TimestepEmbedder,
    get_1d_sincos_pos_embed,
    modulate,
)
from scldm_tpu.nn.nnets import DiT, Decoder, DecoderScvi, Encoder, EncoderScvi  # noqa: F401
from scldm_tpu.nn.heads import (  # noqa: F401
    GaussianLinearHead,
    GaussianTransformerHead,
    NegativeBinomialLinearHead,
    NegativeBinomialTransformerHead,
)
from scldm_tpu.nn.vae import ScviVAE, TransformerVAE  # noqa: F401
from scldm_tpu.nn.priors import StandardPrior  # noqa: F401
