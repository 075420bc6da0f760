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
    """Query-vector attention over the K axis: softmax(x·q/√H)ᵀ·x."""
    scores = jnp.einsum("bnkh,h->bnk", x, params["query"]) / jnp.sqrt(
        jnp.asarray(x.shape[-1], x.dtype)
    )
    w = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bnk,bnkh->bnh", w, x, precision=lax.Precision.HIGHEST)


def linear_pooling(params, x: jax.Array) -> jax.Array:
    """Learned linear combination over K (plus bias)."""
    return jnp.einsum("bnkh,k->bnh", x, params["w"]) + params["b"]


def weighted_pooling(params, x: jax.Array) -> jax.Array:
    """Softmax-normalized per-codebook scalar weights."""
    w = jax.nn.softmax(params["logits"], axis=-1)
    return jnp.einsum("bnkh,k->bnh", x, w)


def init_attentional_pooling(key, dim: int):
    return {"query": jax.random.normal(key, (dim,)) * dim**-0.5}


def init_linear_pooling(key, num_codebooks: int):
    return {
        "w": jnp.full((num_codebooks,), 1.0 / num_codebooks),
        "b": jnp.zeros(()),
    }


def init_weighted_pooling(key, num_codebooks: int):
    return {"logits": jnp.zeros((num_codebooks,))}
