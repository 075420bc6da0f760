"""Fused multi-codebook embedding / output-head layers.

Capability parity with the reference's ``MultiHeadEmbedding`` /
``MultiHeadLinear`` (reference ``downstream/models/multihead.py:28-94``): one
big ``[K·C(+1), H]`` table with per-codebook index offsets so a ``[B, N, K]``
token grid embeds in a single gather, and one fused ``[H, K·C]`` projection
producing per-codebook logits ``[..., K, C]`` in a single MXU matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "multihead_embed",
    "multihead_logits",
    "init_multihead_embedding",
    "init_multihead_linear",
]


def multihead_embed(params, toks: jax.Array, *, vocab_size: int,
                    pad_token: int | None = None) -> jax.Array:
    """``toks`` [..., K] → embeddings [..., K, H].

    Codebook k's token t reads row ``t + k·C``; an optional shared padding
    token (== ``pad_token``) maps every codebook to the final row.
    """
    K = toks.shape[-1]
    offsets = jnp.arange(K, dtype=toks.dtype) * vocab_size
    idx = toks + offsets
    if pad_token is not None:
        idx = jnp.where(toks == pad_token, params["table"].shape[0] - 1, idx)
    return jnp.take(params["table"], idx, axis=0)


def multihead_logits(params, x: jax.Array, *, num_heads: int) -> jax.Array:
    """``x`` [..., H] → per-codebook logits [..., K, C] via one fused matmul."""
    y = jnp.einsum("...h,ho->...o", x, params["w"],
                   precision=lax.Precision.HIGHEST)
    if "b" in params:
        y = y + params["b"]
    return y.reshape(*y.shape[:-1], num_heads, y.shape[-1] // num_heads)


def init_multihead_embedding(key, num_codebooks: int, vocab_size: int,
                             dim: int, pad_row: bool = False):
    rows = num_codebooks * vocab_size + (1 if pad_row else 0)
    return {"table": jax.random.normal(key, (rows, dim)) * 0.02}


def init_multihead_linear(key, dim: int, num_codebooks: int, vocab_size: int,
                          bias: bool = True):
    p = {"w": jax.random.normal(key, (dim, num_codebooks * vocab_size)) * dim**-0.5}
    if bias:
        p["b"] = jnp.zeros((num_codebooks * vocab_size,))
    return p
