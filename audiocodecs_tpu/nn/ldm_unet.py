"""Latent-diffusion UNet (CompVis ``openaimodel.UNetModel``), TPU-native.

The denoiser of the AudioLDM-lineage LDM that SemantiCodec's decoder runs
DDIM over (vendor package behind ``audiocodecs/semanticodec.py:70-76``;
conditioning is cross-attention on the quantized AudioMAE token features).

Structure faithful to the CompVis checkpoint schema (mechanical conversion):

  * sinusoidal ``timestep_embedding`` (cos‖sin halves) → ``time_embed`` MLP;
  * ``input_blocks``: conv-in, then per level ``num_res_blocks`` ×
    [``ResBlock`` (+FiLM time-emb add), ``SpatialTransformer`` at the
    attention resolutions], stride-2 ``Downsample.op`` between levels —
    every block's output pushed on the skip stack;
  * ``middle_block``: ResBlock · SpatialTransformer · ResBlock;
  * ``output_blocks``: mirrored, each consuming one skip via channel concat,
    nearest-2× ``Upsample.conv`` at level ends;
  * ``out``: GN → SiLU → conv.

``SpatialTransformer`` = GN → 1×1 ``proj_in`` → flatten →
``BasicTransformerBlock`` (LN·self-attn, LN·cross-attn(context), LN·GEGLU
FF) × depth → 1×1 ``proj_out`` (+residual). Heads are ``ch //
num_head_channels`` per site, matching the vendor's ``num_head_channels``
convention.

TPU notes: NHWC channel-last; attention over the flattened latent grid is a
single batched einsum per site (static shapes — latent windows are fixed
10.24 s); the skip stack is a Python list resolved at trace time, so the
whole UNet is one XLA program with no dynamic control flow.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.ldm_vae import (
    _conv_init,
    _gn_init,
    conv2d,
    group_norm,
)

__all__ = [
    "UNetConfig",
    "apply_unet",
    "init_unet_params",
    "timestep_embedding",
]


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Defaults follow the AudioLDM-s-style config SemantiCodec builds on
    (latent 8 ch over the 256×16 grid; exact vendor hyper-parameters are
    read from the checkpoint at conversion time — see
    ``convert.ldm.convert_unet_state_dict``)."""

    in_channels: int = 8
    out_channels: int = 8
    model_channels: int = 128
    num_res_blocks: int = 2
    attention_resolutions: tuple = (8, 4, 2)  # in downsample factors
    channel_mult: tuple = (1, 2, 3, 5)
    num_head_channels: int = 32
    context_dim: int = 768
    transformer_depth: int = 1

    @property
    def emb_dim(self) -> int:
        return 4 * self.model_channels


def timestep_embedding(t: jax.Array, dim: int, max_period: int = 10000):
    """OpenAI-convention sinusoidal embedding: ``cos‖sin`` ordering is NOT
    used — vendor emits ``cat([cos, sin])``; ``t`` [B] → [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _linear(p, x):
    return x @ p["w"] + p["b"]


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _layer_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"].astype(
        jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def _res_block(p, x, emb):
    """openaimodel ResBlock: GN→SiLU→conv; +emb; GN→SiLU→conv; skip."""
    h = conv2d(_silu(group_norm(x, p["in_norm"], eps=1e-5)), p["in_conv"])
    h = h + _linear(p["emb"], _silu(emb))[:, None, None, :]
    h = conv2d(_silu(group_norm(h, p["out_norm"], eps=1e-5)), p["out_conv"])
    if "skip" in p:
        x = conv2d(x, p["skip"], padding=0)
    return x + h


def _attention(q, k, v, heads):
    B, Nq, D = q.shape
    Nk = k.shape[1]
    dh = D // heads
    q = q.reshape(B, Nq, heads, dh)
    k = k.reshape(B, Nk, heads, dh)
    v = v.reshape(B, Nk, heads, dh)
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (dh ** -0.5)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
    return out.reshape(B, Nq, D)


def _cross_attention(p, x, context, heads):
    q = x @ p["to_q"]
    k = context @ p["to_k"]
    v = context @ p["to_v"]
    return _linear(p["to_out"], _attention(q, k, v, heads))


def _geglu_ff(p, x):
    h = _linear(p["proj"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    return _linear(p["out"], h * jax.nn.gelu(gate, approximate=False))


def _spatial_transformer(p, x, context, heads):
    B, H, W, C = x.shape
    h = group_norm(x, p["norm"], eps=1e-6)
    h = conv2d(h, p["proj_in"], padding=0).reshape(B, H * W, C)
    for blk in p["blocks"]:
        n1 = _layer_norm(blk["norm1"], h)
        h = h + _cross_attention(blk["attn1"], n1, n1, heads)
        ctx = context if context is not None else h
        h = h + _cross_attention(blk["attn2"], _layer_norm(blk["norm2"], h),
                                 ctx, heads)
        h = h + _geglu_ff(blk["ff"], _layer_norm(blk["norm3"], h))
    h = conv2d(h.reshape(B, H, W, C), p["proj_out"], padding=0)
    return x + h


def _apply_block(p, h, emb, context, cfg: UNetConfig):
    if "conv" in p:
        h = conv2d(h, p["conv"])
    if "res" in p:
        h = _res_block(p["res"], h, emb)
    if "attn" in p:
        heads = h.shape[-1] // cfg.num_head_channels
        h = _spatial_transformer(p["attn"], h, context, heads)
    if "down" in p:
        h = conv2d(h, p["down"], stride=2, padding=1)
    if "up" in p:
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = conv2d(h, p["up"])
    return h


def apply_unet(params, x, t, context, cfg: UNetConfig):
    """``x`` [B, H, W, in_ch] latents, ``t`` [B] timesteps, ``context``
    [B, N, context_dim] cross-attention conditioning → eps [B, H, W, out]."""
    wdt = params["time_embed"]["l0"]["w"].dtype  # follow the param dtype
    emb = _linear(params["time_embed"]["l2"],
                  _silu(_linear(params["time_embed"]["l0"],
                                timestep_embedding(
                                    t, cfg.model_channels).astype(wdt))))
    hs = []
    h = x.astype(wdt)
    if context is not None:
        context = context.astype(wdt)
    for p in params["input_blocks"]:
        h = _apply_block(p, h, emb, context, cfg)
        hs.append(h)
    mid = params["middle"]
    h = _res_block(mid["res1"], h, emb)
    heads = h.shape[-1] // cfg.num_head_channels
    h = _spatial_transformer(mid["attn"], h, context, heads)
    h = _res_block(mid["res2"], h, emb)
    for p in params["output_blocks"]:
        h = jnp.concatenate([h, hs.pop()], axis=-1)
        h = _apply_block(p, h, emb, context, cfg)
    h = _silu(group_norm(h, params["out"]["norm"], eps=1e-5))
    return conv2d(h, params["out"]["conv"])


# ----------------------------- init ---------------------------------- #


def _lin_init(key, din, dout, bias=True):
    p = {"w": jax.random.normal(key, (din, dout)) * din ** -0.5}
    if bias:
        p["b"] = jnp.zeros((dout,))
    return p


def _res_init(ks, cin, cout, emb_dim):
    p = {
        "in_norm": _gn_init(cin),
        "in_conv": _conv_init(next(ks), 3, 3, cin, cout),
        "emb": _lin_init(next(ks), emb_dim, cout),
        "out_norm": _gn_init(cout),
        "out_conv": _conv_init(next(ks), 3, 3, cout, cout),
    }
    if cin != cout:
        p["skip"] = _conv_init(next(ks), 1, 1, cin, cout)
    return p


def _xattn_init(ks, dim, context_dim):
    return {
        "to_q": jax.random.normal(next(ks), (dim, dim)) * dim ** -0.5,
        "to_k": jax.random.normal(next(ks), (context_dim, dim))
        * context_dim ** -0.5,
        "to_v": jax.random.normal(next(ks), (context_dim, dim))
        * context_dim ** -0.5,
        "to_out": _lin_init(next(ks), dim, dim),
    }


def _ln_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}


def _st_init(ks, ch, cfg: UNetConfig):
    blocks = []
    for _ in range(cfg.transformer_depth):
        blocks.append({
            "attn1": _xattn_init(ks, ch, ch),
            "attn2": _xattn_init(ks, ch, cfg.context_dim),
            "ff": {
                "proj": _lin_init(next(ks), ch, ch * 8),
                "out": _lin_init(next(ks), ch * 4, ch),
            },
            "norm1": _ln_init(ch),
            "norm2": _ln_init(ch),
            "norm3": _ln_init(ch),
        })
    return {
        "norm": _gn_init(ch),
        "proj_in": _conv_init(next(ks), 1, 1, ch, ch),
        "blocks": blocks,
        "proj_out": _conv_init(next(ks), 1, 1, ch, ch),
    }


def init_unet_params(key, cfg: UNetConfig):
    ks = iter(jax.random.split(key, 8192))
    mc = cfg.model_channels
    params = {
        "time_embed": {
            "l0": _lin_init(next(ks), mc, cfg.emb_dim),
            "l2": _lin_init(next(ks), cfg.emb_dim, cfg.emb_dim),
        },
        "input_blocks": [
            {"conv": _conv_init(next(ks), 3, 3, cfg.in_channels, mc)}
        ],
        "output_blocks": [],
    }
    ch = mc
    ds = 1
    skip_chs = [mc]
    for i, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _res_init(ks, ch, mult * mc, cfg.emb_dim)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["attn"] = _st_init(ks, ch, cfg)
            params["input_blocks"].append(blk)
            skip_chs.append(ch)
        if i != len(cfg.channel_mult) - 1:
            params["input_blocks"].append(
                {"down": _conv_init(next(ks), 3, 3, ch, ch)})
            skip_chs.append(ch)
            ds *= 2
    params["middle"] = {
        "res1": _res_init(ks, ch, ch, cfg.emb_dim),
        "attn": _st_init(ks, ch, cfg),
        "res2": _res_init(ks, ch, ch, cfg.emb_dim),
    }
    for i, mult in reversed(list(enumerate(cfg.channel_mult))):
        for j in range(cfg.num_res_blocks + 1):
            blk = {"res": _res_init(ks, ch + skip_chs.pop(), mult * mc,
                                    cfg.emb_dim)}
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                blk["attn"] = _st_init(ks, ch, cfg)
            if i and j == cfg.num_res_blocks:
                blk["up"] = _conv_init(next(ks), 3, 3, ch, ch)
                ds //= 2
            params["output_blocks"].append(blk)
    params["out"] = {
        "norm": _gn_init(ch),
        "conv": _conv_init(next(ks), 3, 3, ch, cfg.out_channels),
    }
    return params
