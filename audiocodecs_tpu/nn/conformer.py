"""Conformer encoder blocks (conv-augmented transformer), TPU-native.

The reference's SE recipe uses a SpeechBrain Conformer encoder
(reference ``train_se.py`` hparams); this is the first-party equivalent:
per block —

    x += ½·FFN(LN(x))
    x += MHSA(LN(x))            (RoPE positions, non-causal)
    x += ConvModule(LN(x))      (pointwise→GLU→depthwise k=31→norm→SiLU→pointwise)
    x += ½·FFN(LN(x));  x = LN(x)

All matmuls are MXU-shaped; the depthwise conv is a grouped
``conv_general_dilated``. Channel norm in the conv module is LayerNorm
(inference-stable stand-in for Conformer's BatchNorm).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import conv1d, pad1d
from audiocodecs_tpu.nn.transformer import (
    apply_rope,
    attention,
    rope_cos_sin,
)

__all__ = ["ConformerConfig", "apply_conformer", "init_conformer_params"]


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    hidden_size: int = 256
    num_layers: int = 4
    num_heads: int = 4
    ffn_mult: int = 4
    conv_kernel: int = 31
    eps: float = 1e-5
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lin(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"],
                   precision=jax.lax.Precision.HIGHEST)
    return y + p["b"]


def _ffn(x, p):
    return _lin(jax.nn.silu(_lin(x, p["in"])), p["out"])


def _conv_module(x, p, cfg: ConformerConfig):
    h = _lin(x, p["pw1"])  # [B, T, 2C]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU
    k = cfg.conv_kernel
    pad = (k - 1) // 2
    h = pad1d(h, pad, k - 1 - pad, mode="constant")
    h = conv1d(h, p["dw"]["w"], p["dw"]["b"], groups=cfg.hidden_size)
    h = _ln(h, p["norm"], cfg.eps)
    h = jax.nn.silu(h)
    return _lin(h, p["pw2"])


def apply_conformer(params, x: jax.Array, cfg: ConformerConfig) -> jax.Array:
    """``[B, T, H]`` → ``[B, T, H]`` (non-causal)."""
    T = x.shape[1]
    cos, sin = rope_cos_sin(jnp.arange(T), cfg.head_dim, cfg.rope_theta)
    for p in params["layers"]:
        x = x + 0.5 * _ffn(_ln(x, p["ln_ff1"], cfg.eps), p["ff1"])
        h = _ln(x, p["ln_attn"], cfg.eps)
        B = h.shape[0]
        q = _lin(h, p["q"]).reshape(B, T, cfg.num_heads, cfg.head_dim)
        k = _lin(h, p["k"]).reshape(B, T, cfg.num_heads, cfg.head_dim)
        v = _lin(h, p["v"]).reshape(B, T, cfg.num_heads, cfg.head_dim)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        a = attention(q, k, v)  # non-causal
        x = x + _lin(a.reshape(B, T, cfg.hidden_size), p["o"])
        x = x + _conv_module(_ln(x, p["ln_conv"], cfg.eps), p["conv"], cfg)
        x = x + 0.5 * _ffn(_ln(x, p["ln_ff2"], cfg.eps), p["ff2"])
        x = _ln(x, p["ln_out"], cfg.eps)
    return x


def init_conformer_params(key, cfg: ConformerConfig):
    H = cfg.hidden_size
    F = H * cfg.ffn_mult

    def lin(key, i, o):
        return {"w": jax.random.normal(key, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    def norm():
        return {"g": jnp.ones((H,)), "b": jnp.zeros((H,))}

    layers = []
    for li in range(cfg.num_layers):
        ks = jax.random.split(jax.random.fold_in(key, li), 11)
        layers.append(
            {
                "ln_ff1": norm(),
                "ff1": {"in": lin(ks[0], H, F), "out": lin(ks[1], F, H)},
                "ln_attn": norm(),
                "q": lin(ks[2], H, H), "k": lin(ks[3], H, H),
                "v": lin(ks[4], H, H), "o": lin(ks[5], H, H),
                "ln_conv": norm(),
                "conv": {
                    "pw1": lin(ks[6], H, 2 * H),
                    "dw": {"w": jax.random.normal(
                        ks[7], (cfg.conv_kernel, 1, H)) * 0.05,
                        "b": jnp.zeros((H,))},
                    "norm": norm(),
                    "pw2": lin(ks[8], H, H),
                },
                "ln_ff2": norm(),
                "ff2": {"in": lin(ks[9], H, F), "out": lin(ks[10], F, H)},
                "ln_out": norm(),
            }
        )
    return {"layers": layers}
