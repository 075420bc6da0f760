"""Perceiver resampler (learned-query cross-attention), TPU-native.

BiCodec pools an utterance into a fixed number of global speaker tokens by
cross-attending ``num_latents`` learned queries to the ECAPA feature
sequence (Spark-TTS ``speaker_encoder.py`` uses the naturalspeech2-lineage
``PerceiverResampler``; reference wrapper ``audiocodecs/bicodec.py:68-74``
exposes exactly 32 global tokens). Structure per block: pre-RMSNorm
cross-attention whose kv input *includes the queries* (prepended to the
projected context), then a GEGLU feed-forward; final RMSNorm.

All compute is a handful of [B, N, T] attention matmuls — N is tiny (32),
T is the frame count; maps to one MXU pass per block.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["PerceiverConfig", "apply_perceiver", "init_perceiver_params"]


@dataclasses.dataclass(frozen=True)
class PerceiverConfig:
    dim: int = 128
    depth: int = 2
    num_heads: int = 8
    head_dim: int = 64
    num_latents: int = 32
    dim_context: int = 1024
    ff_mult: int = 4

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.head_dim

    @property
    def ff_inner(self) -> int:
        # naturalspeech2 GEGLU sizing: int(dim · mult · 2/3)
        return int(self.dim * self.ff_mult * 2 / 3)


def _rmsnorm(x, g):
    scale = x.shape[-1] ** 0.5
    n = x * lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
    return n * scale * g


def _cross_attn(latents, ctx, p, cfg: PerceiverConfig):
    B, N, _ = latents.shape
    H, D = cfg.num_heads, cfg.head_dim
    x = _rmsnorm(latents, p["norm"])
    kv_in = jnp.concatenate([x, ctx], axis=1)  # queries included
    q = jnp.einsum("bnc,cd->bnd", x, p["q_w"]).reshape(B, N, H, D)
    kv = jnp.einsum("btc,cd->btd", kv_in, p["kv_w"])
    I = H * D  # torch's to_kv chunks at the inner-dim boundary
    k = kv[..., :I].reshape(B, -1, H, D)
    v = kv[..., I:].reshape(B, -1, H, D)
    scores = jnp.einsum("bnhd,bthd->bhnt", q, k) * (D**-0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    o = jnp.einsum("bhnt,bthd->bnhd", probs, v).reshape(B, N, H * D)
    return jnp.einsum("bnd,dc->bnc", o, p["out_w"])


def apply_perceiver(params, ctx: jax.Array, cfg: PerceiverConfig):
    """``ctx``: [B, T, dim_context] → latents [B, num_latents, dim]."""
    B = ctx.shape[0]
    if "proj_context" in params:
        ctx = jnp.einsum("btc,cd->btd", ctx, params["proj_context"]["w"]) + (
            params["proj_context"]["b"])
    latents = jnp.broadcast_to(params["latents"][None],
                               (B,) + params["latents"].shape)
    for p in params["blocks"]:
        latents = latents + _cross_attn(latents, ctx, p["attn"], cfg)
        h = _rmsnorm(latents, p["ff"]["norm"])
        h = jnp.einsum("bnc,cd->bnd", h, p["ff"]["w1"]) + p["ff"]["b1"]
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.gelu(b, approximate=False)  # GEGLU
        h = jnp.einsum("bnd,dc->bnc", h, p["ff"]["w2"]) + p["ff"]["b2"]
        latents = latents + h
    return _rmsnorm(latents, params["norm"])


def init_perceiver_params(key, cfg: PerceiverConfig):
    ks = jax.random.split(key, 3 + 5 * cfg.depth)
    ki = iter(ks)
    C, I = cfg.dim, cfg.inner_dim

    def blk():
        return {
            "attn": {
                "norm": jnp.ones((C,)),
                "q_w": jax.random.normal(next(ki), (C, I)) * C**-0.5,
                "kv_w": jax.random.normal(next(ki), (C, 2 * I)) * C**-0.5,
                "out_w": jax.random.normal(next(ki), (I, C)) * I**-0.5,
            },
            "ff": {
                "norm": jnp.ones((C,)),
                "w1": jax.random.normal(next(ki), (C, 2 * cfg.ff_inner))
                * C**-0.5,
                "b1": jnp.zeros((2 * cfg.ff_inner,)),
                "w2": jax.random.normal(next(ki), (cfg.ff_inner, C))
                * cfg.ff_inner**-0.5,
                "b2": jnp.zeros((C,)),
            },
        }

    params = {
        "latents": jax.random.normal(next(ki), (cfg.num_latents, C)),
        "blocks": [blk() for _ in range(cfg.depth)],
        "norm": jnp.ones((C,)),
    }
    if cfg.dim_context != cfg.dim:
        params["proj_context"] = {
            "w": jax.random.normal(next(ki), (cfg.dim_context, C))
            * cfg.dim_context**-0.5,
            "b": jnp.zeros((C,)),
        }
    return params
