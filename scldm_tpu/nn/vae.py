"""VAE compositions (reference src/scldm/vae.py).

`TransformerVAE` is deterministic in the LDM pipeline — no reparameterization,
no KL: the latent is the LayerNorm'd linear output of the encoder and the loss
is reconstruction-only (reference nnets.py:132-135, models.py:233-247).
`ScviVAE` is the stochastic MLP baseline with an explicit Gaussian posterior.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scldm_tpu.nn.heads import (
    GaussianLinearHead,
    GaussianTransformerHead,
    NegativeBinomialLinearHead,
    NegativeBinomialTransformerHead,
)
from scldm_tpu.nn.layers import InputTransformerVAE
from scldm_tpu.nn.nnets import Decoder, DecoderScvi, Encoder, EncoderScvi


class TransformerVAE(nn.Module):
    """input_layer -> MCAB encoder -> equivariant decoder -> likelihood head.

    Calls (parity with reference vae.py:29-87):
      __call__(counts, genes, library_size, counts_subset, genes_subset)
          -> (params dict with "mu" [, "theta"], h_z)
      encode(...)  -> h_z   (the LDM tokenizer direction)
      decode(z, genes, library_size) -> distribution params
    """

    encoder: Encoder
    decoder: Decoder
    decoder_head: nn.Module
    input_layer: InputTransformerVAE

    def _decoder_queries(self, genes: jax.Array) -> jax.Array:
        """Resolve decoder queries under shared/unshared gene embeddings
        (reference vae.py:42-44)."""
        if self.decoder.shared_embedding:
            return self.input_layer.embed_genes(genes)
        return genes

    def _head_params(
        self, h_x: jax.Array, genes: jax.Array, library_size: jax.Array
    ) -> Dict[str, jax.Array]:
        if isinstance(self.decoder_head, GaussianTransformerHead):
            return {"mu": self.decoder_head(h_x, genes, library_size)}
        mu, theta = self.decoder_head(h_x, genes, library_size)
        return {"mu": mu, "theta": theta}

    def __call__(
        self,
        counts: jax.Array,
        genes: jax.Array,
        library_size: jax.Array,
        counts_subset: Optional[jax.Array] = None,
        genes_subset: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[Dict[str, jax.Array], jax.Array]:
        emb = self.input_layer(counts_subset, genes_subset)
        h_z = self.encoder(emb, train=train)
        h_x = self.decoder(h_z, self._decoder_queries(genes), train=train)
        return self._head_params(h_x, genes, library_size), h_z

    def encode(
        self,
        counts: jax.Array,
        genes: jax.Array,
        counts_subset: Optional[jax.Array] = None,
        genes_subset: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        emb = self.input_layer(
            counts_subset if counts_subset is not None else counts,
            genes_subset if genes_subset is not None else genes,
        )
        return self.encoder(emb, train=train)

    def decode(
        self,
        z: jax.Array,
        genes: jax.Array,
        library_size: jax.Array,
        condition: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        h_x = self.decoder(z, self._decoder_queries(genes), condition=condition, train=train)
        return self._head_params(h_x, genes, library_size)


class ScviVAE(nn.Module):
    """MLP VAE baseline with Gaussian posterior + reparameterization
    (reference vae.py:90-128)."""

    encoder: EncoderScvi
    encoder_head: GaussianLinearHead
    decoder: DecoderScvi
    decoder_head: NegativeBinomialLinearHead

    def __call__(
        self,
        counts: jax.Array,
        genes: jax.Array,
        library_size: jax.Array,
        condition: Optional[Dict[str, jax.Array]] = None,
        counts_subset: Optional[jax.Array] = None,
        genes_subset: Optional[jax.Array] = None,
        train: bool = False,
    ):
        h = self.encoder(counts, train=train)
        loc, scale = self.encoder_head(h)
        eps = jax.random.normal(self.make_rng("sample"), loc.shape, loc.dtype)
        z = loc + eps * scale
        h_x = self.decoder(z, train=train)
        mu, theta = self.decoder_head(h_x, None, library_size)
        return {"mu": mu, "theta": theta}, (loc, scale), z

    def decode(
        self,
        z: jax.Array,
        genes: jax.Array | None,
        library_size: jax.Array,
        condition=None,
        train: bool = False,
    ) -> Dict[str, jax.Array]:
        h_x = self.decoder(z, train=train)
        mu, theta = self.decoder_head(h_x, None, library_size)
        return {"mu": mu, "theta": theta}


def build_transformer_vae(
    *,
    n_genes: int,
    n_embed: int = 32,
    n_embed_latent: int = 16,
    n_layer: int = 8,
    n_inducing_points: int = 16,
    n_head: int = 8,
    n_head_cross: int = 4,
    dropout: float = 0.0,
    bias: bool = False,
    multiple_of: int = 4,
    layernorm_eps: float = 1e-8,
    positional_encoding: bool = True,
    shared_embedding: bool = True,
    agg_func: str = "log1p",
    decoder_head: str = "negative_binomial_shared_theta",
    head_temperature: float = 1.0,
    remat: bool = False,
    remat_cross: bool = False,
    cross_chunks: int = 1,
    dtype: jnp.dtype = jnp.float32,
) -> TransformerVAE:
    """Assemble a TransformerVAE with the reference default architecture
    (experiments/configs/model/vae_base.yaml:3-54)."""
    encoder = Encoder(
        n_layer=n_layer,
        n_inducing_points=n_inducing_points,
        n_embed=n_embed,
        n_embed_latent=n_embed_latent,
        n_head=n_head,
        n_head_cross=n_head_cross,
        dropout=dropout,
        bias=bias,
        multiple_of=multiple_of,
        layernorm_eps=layernorm_eps,
        positional_encoding=positional_encoding,
        remat=remat,
        dtype=dtype,
    )
    decoder = Decoder(
        n_genes=n_genes,
        n_embed=n_embed,
        n_embed_latent=n_embed_latent,
        n_head=n_head,
        n_head_cross=n_head_cross,
        n_layer=n_layer,
        n_inducing_points=n_inducing_points,
        dropout=dropout,
        bias=bias,
        multiple_of=multiple_of,
        layernorm_eps=layernorm_eps,
        shared_embedding=shared_embedding,
        remat=remat,
        remat_cross=remat_cross,
        cross_chunks=cross_chunks,
        dtype=dtype,
    )
    if decoder_head == "negative_binomial_shared_theta":
        head = NegativeBinomialTransformerHead(
            n_genes=n_genes,
            shared_theta=True,
            n_embed=n_embed,
            layernorm_eps=layernorm_eps,
            t=head_temperature,
            dtype=dtype,
        )
    elif decoder_head == "negative_binomial_unshared_theta":
        head = NegativeBinomialTransformerHead(
            n_genes=n_genes,
            shared_theta=False,
            n_embed=n_embed,
            layernorm_eps=layernorm_eps,
            t=head_temperature,
            dtype=dtype,
        )
    elif decoder_head == "gaussian":
        head = GaussianTransformerHead(
            n_embed=n_embed, layernorm_eps=layernorm_eps, dtype=dtype
        )
    else:
        raise ValueError(f"Unknown decoder_head: {decoder_head}")
    input_layer = InputTransformerVAE(
        n_genes=n_genes, n_embed=n_embed, agg_func=agg_func, dtype=dtype
    )
    return TransformerVAE(
        encoder=encoder, decoder=decoder, decoder_head=head, input_layer=input_layer
    )
