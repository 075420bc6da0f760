"""AudioMAE-style patch ViT encoder (SemantiCodec's semantic encoder).

The real SemantiCodec runs kaldi-fbank mel through an AudioMAE ViT-B in
1024-frame windows, producing ``[B, 513, 768]`` per window (512 patches on a
64×8 grid of 16×16 patches + a cls token) — reference
``audiocodecs/semanticodec.py:263-295``. This is that encoder as pure JAX
with timm-compatible parameter structure, so the released AudioMAE-shaped
state dict converts mechanically
(:func:`audiocodecs_tpu.convert.audiomae.convert_audiomae_state_dict`).

Blocks are standard pre-LN ViT: ln → fused-qkv attention → residual →
ln → MLP(gelu) → residual; learned (checkpoint-provided) pos embeddings.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["AudioMAEConfig", "apply_audiomae", "init_audiomae_params"]


@dataclasses.dataclass(frozen=True)
class AudioMAEConfig:
    mel_frames: int = 1024  # window length in mel frames
    mel_bins: int = 128
    patch_size: int = 16
    hidden_size: int = 768  # ViT-B
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    eps: float = 1e-6

    @property
    def grid(self) -> tuple[int, int]:
        return (self.mel_frames // self.patch_size,
                self.mel_bins // self.patch_size)

    @property
    def num_patches(self) -> int:
        gh, gw = self.grid
        return gh * gw


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["g"] + p["b"]


def _attention(x, p, num_heads):
    B, N, D = x.shape
    qkv = jnp.einsum("bnd,de->bne", x, p["qkv"]["w"],
                     precision=lax.Precision.HIGHEST) + p["qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    hd = D // num_heads

    def heads(t):
        return t.reshape(B, N, num_heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                        precision=lax.Precision.HIGHEST) * hd**-0.5
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                     precision=lax.Precision.HIGHEST)
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return jnp.einsum("bnd,de->bne", out, p["proj"]["w"],
                      precision=lax.Precision.HIGHEST) + p["proj"]["b"]


def apply_audiomae(params, mel: jax.Array, cfg: AudioMAEConfig,
                   keep_cls: bool = False) -> jax.Array:
    """``mel`` [B, mel_frames, mel_bins] → features [B, (1+)P, D]."""
    B = mel.shape[0]
    ps = cfg.patch_size
    gh, gw = cfg.grid
    # patch embed == Conv2d(1, D, ps, stride=ps): einsum over patch pixels.
    x = mel.reshape(B, gh, ps, gw, ps)
    x = x.transpose(0, 1, 3, 2, 4).reshape(B, gh * gw, ps * ps)
    x = jnp.einsum("bnp,pd->bnd", x, params["patch_embed"]["w"],
                   precision=lax.Precision.HIGHEST) + params["patch_embed"]["b"]
    cls = jnp.broadcast_to(params["cls_token"],
                           (B, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None, : x.shape[1]]
    for blk in params["blocks"]:
        x = x + _attention(_ln(x, blk["norm1"], cfg.eps), blk["attn"],
                           cfg.num_heads)
        h = _ln(x, blk["norm2"], cfg.eps)
        h = jnp.einsum("bnd,de->bne", h, blk["mlp"]["fc1"]["w"],
                       precision=lax.Precision.HIGHEST) + blk["mlp"]["fc1"]["b"]
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.einsum("bne,ed->bnd", h, blk["mlp"]["fc2"]["w"],
                       precision=lax.Precision.HIGHEST) + blk["mlp"]["fc2"]["b"]
        x = x + h
    x = _ln(x, params["norm"], cfg.eps)
    return x if keep_cls else x[:, 1:]


def init_audiomae_params(key, cfg: AudioMAEConfig):
    D = cfg.hidden_size
    ps2 = cfg.patch_size**2
    hidden = int(D * cfg.mlp_ratio)
    ks = jax.random.split(key, cfg.num_layers + 3)

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    def norm():
        return {"g": jnp.ones((D,)), "b": jnp.zeros((D,))}

    blocks = []
    for li in range(cfg.num_layers):
        k1, k2, k3, k4 = jax.random.split(ks[li], 4)
        blocks.append({
            "norm1": norm(),
            "attn": {"qkv": lin(k1, D, 3 * D), "proj": lin(k2, D, D)},
            "norm2": norm(),
            "mlp": {"fc1": lin(k3, D, hidden), "fc2": lin(k4, hidden, D)},
        })
    return {
        "patch_embed": lin(ks[-3], ps2, D),
        "cls_token": jax.random.normal(ks[-2], (1, D)) * 0.02,
        "pos_embed": jax.random.normal(ks[-1],
                                       (cfg.num_patches + 1, D)) * 0.02,
        "blocks": blocks,
        "norm": norm(),
    }
