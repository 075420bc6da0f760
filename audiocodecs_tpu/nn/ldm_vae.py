"""AutoencoderKL (CompVis latent-diffusion VAE), TPU-native, channel-last 2-D.

The mel↔latent autoencoder of the AudioLDM-lineage decoders. SemantiCodec's
LDM decode chain (vendor package behind ``audiocodecs/semanticodec.py:70-76``)
denoises in this VAE's latent space and decodes latents → 64-bin mel with the
``Decoder`` here, then vocodes with :mod:`audiocodecs_tpu.nn.hifigan`.

Faithful to the CompVis ``ldm.modules.diffusionmodules.model`` structure
(naming mirrors the checkpoint schema so conversion is mechanical):

  * ``ResnetBlock``: GN(32, eps 1e-6) → swish → conv3×3 → GN → swish →
    conv3×3, 1×1 ``nin_shortcut`` when channels change.
  * ``AttnBlock``: single-head spatial self-attention with 1×1 q/k/v/proj.
  * ``Decoder``: ``conv_in`` → mid(block_1, attn_1, block_2) → per level
    (reversed ``ch_mult``): ``num_res_blocks+1`` blocks + nearest-2×
    ``upsample.conv`` → ``norm_out`` → swish → ``conv_out``.
  * ``Encoder``: mirror with stride-2 asymmetric-pad ``downsample.conv``;
    emits ``2·z_channels`` (mean‖logvar).

Audio layout: mel [B, T, M, 1] with time as the image height and mel bins as
width; the latent grid is [B, T/2^(L-1), M/2^(L-1), z].

TPU notes: channel-last NHWC keeps channels on the lane axis; attention is
one batched einsum over the flattened spatial grid (static shapes);
upsampling is ``jnp.repeat`` (nearest) + conv, which XLA fuses.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "VAEConfig",
    "apply_vae_decoder",
    "apply_vae_encoder",
    "init_vae_params",
    "AUDIOLDM_VAE",
]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 1
    out_channels: int = 1
    ch: int = 128
    ch_mult: tuple = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 8
    embed_dim: int = 8

    @property
    def downsample_factor(self) -> int:
        return 2 ** (len(self.ch_mult) - 1)


# AudioLDM / SemantiCodec first-stage VAE: mel 64 bins → latent [T/4, 16, 8].
AUDIOLDM_VAE = VAEConfig()


def swish(x):
    return x * jax.nn.sigmoid(x)


def group_norm(x, p, *, groups: int = 32, eps: float = 1e-6):
    """GroupNorm over the channel (last) axis of [..., C].

    Statistics in f32 regardless of activation dtype (bf16 mean/var is the
    classic mixed-precision failure mode); output keeps ``x``'s dtype.
    """
    c = x.shape[-1]
    g = min(groups, c)
    shape = x.shape[:-1] + (g, c // g)
    xg = x.astype(jnp.float32).reshape(shape)
    mean = xg.mean(axis=tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,),
                   keepdims=True)
    var = xg.var(axis=tuple(range(1, xg.ndim - 2)) + (xg.ndim - 1,),
                 keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    out = xg.reshape(x.shape) * p["scale"].astype(jnp.float32) + (
        p["bias"].astype(jnp.float32))
    return out.astype(x.dtype)


def conv2d(x, p, *, stride: int = 1, padding=1):
    """NHWC conv; ``p['w']`` is [kh, kw, Cin, Cout].

    ``padding`` is an int (same on both axes) or explicit
    ``((top, bottom), (left, right))``.
    """
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"]


def resnet_block(p, x, temb=None):
    h = conv2d(swish(group_norm(x, p["norm1"])), p["conv1"])
    if temb is not None:
        h = h + (temb @ p["temb_proj"]["w"] + p["temb_proj"]["b"])[:, None, None, :]
    h = conv2d(swish(group_norm(h, p["norm2"])), p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d(x, p["nin_shortcut"], padding=0)
    return x + h


def attn_block(p, x):
    """Single-head spatial self-attention (CompVis ``AttnBlock``)."""
    B, H, W, C = x.shape
    h = group_norm(x, p["norm"])
    q = conv2d(h, p["q"], padding=0).reshape(B, H * W, C)
    k = conv2d(h, p["k"], padding=0).reshape(B, H * W, C)
    v = conv2d(h, p["v"], padding=0).reshape(B, H * W, C)
    attn = jax.nn.softmax(
        (jnp.einsum("bqc,bkc->bqk", q, k) * (C ** -0.5)).astype(jnp.float32),
        axis=-1).astype(q.dtype)
    h = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(B, H, W, C)
    return x + conv2d(h, p["proj_out"], padding=0)


def apply_vae_decoder(params, z: jax.Array, cfg: VAEConfig) -> jax.Array:
    """latents [B, h, w, embed_dim] → mel-domain output [B, H, W, out_ch]."""
    z = z.astype(params["post_quant_conv"]["w"].dtype)
    h = conv2d(z, params["post_quant_conv"], padding=0)
    d = params["decoder"]
    h = conv2d(h, d["conv_in"])
    h = resnet_block(d["mid"]["block_1"], h)
    h = attn_block(d["mid"]["attn_1"], h)
    h = resnet_block(d["mid"]["block_2"], h)
    for level in d["up"]:  # stored innermost-first (reversed ch_mult walk)
        for blk in level["block"]:
            h = resnet_block(blk, h)
        if "upsample" in level:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            h = conv2d(h, level["upsample"])
    h = swish(group_norm(h, d["norm_out"]))
    return conv2d(h, d["conv_out"])


def apply_vae_encoder(params, x: jax.Array, cfg: VAEConfig):
    """input [B, H, W, in_ch] → (mean, logvar), each [B, h, w, embed_dim]."""
    e = params["encoder"]
    h = conv2d(x, e["conv_in"])
    for level in e["down"]:
        for blk in level["block"]:
            h = resnet_block(blk, h)
        if "downsample" in level:
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(h, level["downsample"], stride=2, padding=0)
    h = resnet_block(e["mid"]["block_1"], h)
    h = attn_block(e["mid"]["attn_1"], h)
    h = resnet_block(e["mid"]["block_2"], h)
    h = swish(group_norm(h, e["norm_out"]))
    h = conv2d(h, e["conv_out"])  # 2*z_channels
    moments = conv2d(h, params["quant_conv"], padding=0)  # 2*embed_dim
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, logvar


# ----------------------------- init ---------------------------------- #


def _conv_init(key, kh, kw, cin, cout):
    scale = (kh * kw * cin) ** -0.5
    return {
        "w": jax.random.normal(key, (kh, kw, cin, cout)) * scale,
        "b": jnp.zeros((cout,)),
    }


def _gn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _res_init(ks, cin, cout):
    p = {
        "norm1": _gn_init(cin),
        "conv1": _conv_init(next(ks), 3, 3, cin, cout),
        "norm2": _gn_init(cout),
        "conv2": _conv_init(next(ks), 3, 3, cout, cout),
    }
    if cin != cout:
        p["nin_shortcut"] = _conv_init(next(ks), 1, 1, cin, cout)
    return p


def _attn_init(ks, c):
    return {
        "norm": _gn_init(c),
        "q": _conv_init(next(ks), 1, 1, c, c),
        "k": _conv_init(next(ks), 1, 1, c, c),
        "v": _conv_init(next(ks), 1, 1, c, c),
        "proj_out": _conv_init(next(ks), 1, 1, c, c),
    }


def init_vae_params(key, cfg: VAEConfig):
    ks = iter(jax.random.split(key, 4096))
    L = len(cfg.ch_mult)

    # encoder
    enc = {"conv_in": _conv_init(next(ks), 3, 3, cfg.in_channels, cfg.ch),
           "down": []}
    ch = cfg.ch
    for i, m in enumerate(cfg.ch_mult):
        cout = cfg.ch * m
        level = {"block": []}
        for _ in range(cfg.num_res_blocks):
            level["block"].append(_res_init(ks, ch, cout))
            ch = cout
        if i != L - 1:
            level["downsample"] = _conv_init(next(ks), 3, 3, ch, ch)
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": _res_init(ks, ch, ch),
        "attn_1": _attn_init(ks, ch),
        "block_2": _res_init(ks, ch, ch),
    }
    enc["norm_out"] = _gn_init(ch)
    enc["conv_out"] = _conv_init(next(ks), 3, 3, ch, 2 * cfg.z_channels)

    # decoder (levels stored innermost-first, i.e. the order they are applied)
    block_in = cfg.ch * cfg.ch_mult[-1]
    dec = {"conv_in": _conv_init(next(ks), 3, 3, cfg.z_channels, block_in)}
    dec["mid"] = {
        "block_1": _res_init(ks, block_in, block_in),
        "attn_1": _attn_init(ks, block_in),
        "block_2": _res_init(ks, block_in, block_in),
    }
    ch = block_in
    up = []
    for i in reversed(range(L)):
        cout = cfg.ch * cfg.ch_mult[i]
        level = {"block": []}
        for _ in range(cfg.num_res_blocks + 1):
            level["block"].append(_res_init(ks, ch, cout))
            ch = cout
        if i != 0:
            level["upsample"] = _conv_init(next(ks), 3, 3, ch, ch)
        up.append(level)
    dec["up"] = up
    dec["norm_out"] = _gn_init(ch)
    dec["conv_out"] = _conv_init(next(ks), 3, 3, ch, cfg.out_channels)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv_init(next(ks), 1, 1, 2 * cfg.z_channels,
                                 2 * cfg.embed_dim),
        "post_quant_conv": _conv_init(next(ks), 1, 1, cfg.embed_dim,
                                      cfg.z_channels),
    }
