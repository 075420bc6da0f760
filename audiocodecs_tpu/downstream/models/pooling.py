"""Codebook-axis pooling layers.

Capability parity with the reference's pooling trio (reference
``downstream/models/pooling.py:26-81``): collapse the K codebook axis of
``[B, N, K, H]`` features to ``[B, N, H]`` by attention, a learned linear mix,
or softmax-weighted channel mixing. All are single fused einsums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "attentional_pooling",
    "linear_pooling",
    "weighted_pooling",
    "init_attentional_pooling",
    "init_linear_pooling",
    "init_weighted_pooling",
]


def attentional_pooling(params, x: jax.Array) -> jax.Array:
    """Two-layer MLP attention scorer over the K axis (reference
    ``pooling.py:26-45``): softmax_K(W₂·relu(W₁x+b₁)) weights, then a
    weighted sum — one fused einsum chain."""
    h = jnp.einsum("bnkh,hd->bnkd", x, params["w1"]) + params["b1"]
    scores = jnp.einsum("bnkd,d->bnk", jax.nn.relu(h), params["w2"])
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnk,bnkh->bnh", w, x, precision=lax.Precision.HIGHEST)


def linear_pooling(params, x: jax.Array) -> jax.Array:
    """Learned linear combination over K (no bias, reference
    ``pooling.py:48-62``; identity when K == 1)."""
    if x.shape[-2] == 1:
        return x[..., 0, :]
    y = jnp.einsum("bnkh,k->bnh", x, params["w"])
    if "b" in params:  # kept for checkpoints saved before the bias removal
        y = y + params["b"]
    return y


def weighted_pooling(params, x: jax.Array,
                     channel_idx: int | None = None) -> jax.Array:
    """Softmax-normalized per-codebook scalar weights; ``channel_idx``
    instead selects one codebook (reference ``pooling.py:65-81``)."""
    if channel_idx is not None:
        return x[..., channel_idx, :]
    w = jax.nn.softmax(params["logits"], axis=-1)
    return jnp.einsum("bnkh,k->bnh", x, w)


def init_attentional_pooling(key, dim: int, hidden: int | None = None):
    hidden = hidden or dim
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (dim, hidden)) * dim**-0.5,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden,)) * hidden**-0.5,
    }


def init_linear_pooling(key, num_codebooks: int):
    return {"w": jnp.full((num_codebooks,), 1.0 / num_codebooks)}


def init_weighted_pooling(key, num_codebooks: int):
    return {"logits": jnp.zeros((num_codebooks,))}
