"""RoFormer-style transformer blocks (BS-RoFormer lineage), TPU-native.

XCodec2's vocoder backbone stacks BS-RoFormer transformer blocks over the
50 Hz frame axis (vendor ``vq/bs_roformer5.py`` + ``codec_decoder_vocos.py``
behind the reference wrapper ``audiocodecs/xcodec2.py:98-115``); MagiCodec's
encoder/decoder are the same shape. Block structure (lucidrains
BS-RoFormer):

  * pre-RMSNorm (``x/‖x‖·√d·γ``) on both branches;
  * attention: fused ``to_qkv`` (no bias), rotary embedding on q/k
    (interleaved-pair rotate-half, θ=10000), per-head sigmoid gates from a
    ``to_gates`` linear, ``to_out`` (no bias);
  * feed-forward: linear → GELU → linear.

All time-mixing is batched matmuls on the MXU; RoPE phases are trace-time
constants per static sequence length.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["RoformerConfig", "apply_roformer", "init_roformer_params"]


@dataclasses.dataclass(frozen=True)
class RoformerConfig:
    dim: int = 1024
    depth: int = 12
    num_heads: int = 16
    ffn_mult: int = 4
    rope_dim: int = 64  # rotary dims per head (vendor pos_meb_dim)
    rope_theta: float = 10000.0
    use_gates: bool = True  # per-head sigmoid output gates (BS-RoFormer)
    ffn: str = "gelu"  # "gelu" (BS-RoFormer) | "swiglu" (stable-audio-tools)

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def _rmsnorm(x, g):
    scale = x.shape[-1] ** 0.5
    n = x * lax.rsqrt(jnp.sum(x * x, axis=-1, keepdims=True) + 1e-12)
    return n * scale * g


def _rope_phases(T: int, cfg: RoformerConfig):
    """[T, rope_dim] cos/sin with each frequency repeated for the
    interleaved pair layout (lucidrains ``rotate_half``)."""
    freqs = 1.0 / (
        cfg.rope_theta
        ** (np.arange(0, cfg.rope_dim, 2, dtype=np.float64) / cfg.rope_dim)
    )
    ang = np.arange(T, dtype=np.float64)[:, None] * freqs[None, :]
    ang = np.repeat(ang, 2, axis=-1)  # [T, rope_dim], pairwise duplicated
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _rotate_half(x):
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    return jnp.stack([-x2, x1], axis=-1).reshape(x.shape)


def _apply_rope(x, cos, sin):
    """x: [B, T, H, D]; rotate the first rope_dim dims of D."""
    r = cos.shape[-1]
    xr, xp = x[..., :r], x[..., r:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return jnp.concatenate([xr * c + _rotate_half(xr) * s, xp], axis=-1)


def _precision():
    """Role-aware matmul precision (``nn/layers.conv_precision``): encoder
    -side blocks default to HIGHEST (token-affecting — argmin-marginal
    tokens flip at reduced precision, CLAUDE.md rule), decoder-side blocks
    honor ``ACX_DEC_CONV_PRECISION`` so serving presets reach the
    RoFormer codecs (MagiCodec/StableCodec decode, XCodec2 vocoder)."""
    from audiocodecs_tpu.nn.layers import conv_precision

    return conv_precision()


def _attention(x, p, cfg: RoformerConfig, cos, sin, prec):
    B, T, C = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    qkv = jnp.einsum("btc,cd->btd", x, p["qkv_w"], precision=prec)
    q, k, v = jnp.split(qkv.reshape(B, T, 3, H, D), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # [B, T, H, D]
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        precision=prec) * (D**-0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhts,bshd->bthd", probs, v, precision=prec)
    if "gates" in p:
        gates = jax.nn.sigmoid(
            jnp.einsum("btc,ch->bth", x, p["gates"]["w"], precision=prec)
            + p["gates"]["b"]
        )  # [B, T, H]
        o = o * gates[..., None]
    return jnp.einsum("btd,dc->btc", o.reshape(B, T, H * D), p["out_w"],
                      precision=prec)


def apply_roformer(params, x: jax.Array, cfg: RoformerConfig) -> jax.Array:
    """``[B, T, dim]`` → ``[B, T, dim]`` through ``depth`` blocks."""
    cos, sin = _rope_phases(x.shape[1], cfg)
    prec = _precision()
    for p in params["blocks"]:
        x = x + _attention(_rmsnorm(x, p["attn_norm"]), p["attn"], cfg,
                           cos, sin, prec)
        h = _rmsnorm(x, p["ffn_norm"])
        f = p["ffn"]
        if cfg.ffn == "swiglu":
            g = jnp.einsum("btc,cd->btd", h, f["w1"], precision=prec)
            u = jnp.einsum("btc,cd->btd", h, f["wg"], precision=prec)
            h = jax.nn.silu(g) * u
        else:
            h = jnp.einsum("btc,cd->btd", h, f["w1"], precision=prec) + f["b1"]
            h = jax.nn.gelu(h, approximate=False)
        h = jnp.einsum("btd,dc->btc", h, f["w2"], precision=prec)
        if "b2" in f:
            h = h + f["b2"]
        x = x + h
    return x


def init_roformer_params(key, cfg: RoformerConfig):
    C, F = cfg.dim, cfg.dim * cfg.ffn_mult

    def block(k):
        ks = jax.random.split(k, 6)
        attn = {
            "qkv_w": jax.random.normal(ks[0], (C, 3 * C)) * C**-0.5,
            "out_w": jax.random.normal(ks[2], (C, C)) * C**-0.5,
        }
        if cfg.use_gates:
            attn["gates"] = {
                "w": jax.random.normal(ks[1], (C, cfg.num_heads)) * C**-0.5,
                "b": jnp.zeros((cfg.num_heads,)),
            }
        if cfg.ffn == "swiglu":
            ffn = {
                "w1": jax.random.normal(ks[3], (C, F)) * C**-0.5,
                "wg": jax.random.normal(ks[5], (C, F)) * C**-0.5,
                "w2": jax.random.normal(ks[4], (F, C)) * F**-0.5,
            }
        else:
            ffn = {
                "w1": jax.random.normal(ks[3], (C, F)) * C**-0.5,
                "b1": jnp.zeros((F,)),
                "w2": jax.random.normal(ks[4], (F, C)) * F**-0.5,
                "b2": jnp.zeros((C,)),
            }
        return {"attn_norm": jnp.ones((C,)), "attn": attn,
                "ffn_norm": jnp.ones((C,)), "ffn": ffn}

    return {"blocks": [block(k) for k in jax.random.split(key, cfg.depth)]}
