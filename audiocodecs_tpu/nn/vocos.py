"""Vocos-style vocoder: ConvNeXt backbone + ISTFT head, TPU-native.

Supports the reference's EnCodec+Vocos decode path (reference
``audiocodecs/encodec.py:52-66,130-138``: ``charactr/vocos-encodec-{tag}khz``
replaces the EnCodec decoder, conditioned on a bandwidth id) and the
WavTokenizer family's Vocos-style decode head (reference
``wavtokenizer.py:78-82``).

Architecture (public charactr/vocos): embed conv7 → [ConvNeXt block ×N:
depthwise conv7 → (Ada)LayerNorm → pointwise MLP (GELU) → layer-scale γ →
residual] → final LayerNorm → linear to ``n_fft + 2`` → magnitude=exp(·),
phase angle → ISTFT (centered Hann overlap-add).

TPU notes: depthwise convs lower to grouped ``conv_general_dilated``; the
ISTFT is an irfft + one strided overlap-add expressed as a transposed conv
against the window — all dense XLA ops.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audiocodecs_tpu.nn.layers import conv1d, pad1d

__all__ = ["VocosConfig", "apply_vocos", "apply_vocos_backbone",
           "init_vocos_params", "init_vocos_backbone_params", "istft"]


@dataclasses.dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 128
    dim: int = 384
    intermediate_dim: int = 1152
    num_layers: int = 8
    n_fft: int = 1280
    hop_length: int = 320
    num_adanorm_embeddings: Optional[int] = 4  # None → plain LayerNorm
    eps: float = 1e-6


def _layernorm(x, g, b, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * g + b


def _ada_layernorm(x, p, cond_id, eps):
    """Conditional LayerNorm: per-condition scale/shift embedding tables."""
    scale = p["scale"][cond_id]  # [dim]
    shift = p["shift"][cond_id]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * scale + shift


def _ada_layernorm_cont(x, p, cond, eps):
    """Continuous-condition LayerNorm: scale/shift from a condition vector
    (Spark-TTS prenet style). ``cond``: [B, cond_dim]."""
    scale = jnp.einsum("bc,cd->bd", cond, p["scale_w"]) + p["scale_b"]
    shift = jnp.einsum("bc,cd->bd", cond, p["shift_w"]) + p["shift_b"]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    n = (x - mean) * lax.rsqrt(var + eps)
    return n * scale[:, None, :] + shift[:, None, :]


def _convnext_block(x, p, cfg: VocosConfig, cond_id, cond=None):
    h = pad1d(x, 3, 3, mode="constant")
    h = conv1d(h, p["dwconv"]["w"], p["dwconv"]["b"], groups=cfg.dim)
    if cond is not None and "adanorm_cont" in p:
        h = _ada_layernorm_cont(h, p["adanorm_cont"], cond, cfg.eps)
    elif cond_id is not None and "adanorm" in p:
        h = _ada_layernorm(h, p["adanorm"], cond_id, cfg.eps)
    else:
        h = _layernorm(h, p["norm"]["g"], p["norm"]["b"], cfg.eps)
    h = jnp.einsum("btc,cd->btd", h, p["pw1"]["w"]) + p["pw1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    h = jnp.einsum("btd,dc->btc", h, p["pw2"]["w"]) + p["pw2"]["b"]
    if "gamma" in p:
        h = h * p["gamma"]
    return x + h


def istft(spec_real, spec_imag, n_fft: int, hop: int,
          padding: str = "center"):
    """Inverse STFT with Hann window.

    ``padding="center"`` matches ``torch.istft(center=True)``:
    [B, N, n_fft//2+1] → [B, (N-1)·hop]. ``padding="same"`` matches the
    Vocos ``ISTFTHead(padding="same")`` used by WavTokenizer/XCodec2
    generators: trims (n_fft−hop)/2 per side → [B, N·hop].
    """
    window = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = spec_real + 1j * spec_imag
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, N, n_fft]
    frames = frames * window
    B, N, _ = frames.shape
    # Overlap-add via transposed conv against identity: [B, N, n_fft] frames
    # dilated by hop. Equivalent dense form:
    out_len = (N - 1) * hop + n_fft
    idx = jnp.arange(N)[:, None] * hop + jnp.arange(n_fft)[None, :]
    y = jnp.zeros((B, out_len), frames.dtype)
    y = y.at[:, idx.reshape(-1)].add(frames.reshape(B, -1))
    win_sq = jnp.zeros((out_len,), frames.dtype)
    win_sq = win_sq.at[idx.reshape(-1)].add(
        jnp.tile(window**2, (N,))
    )
    y = y / jnp.maximum(win_sq, 1e-11)
    pad = n_fft // 2 if padding == "center" else (n_fft - hop) // 2
    return y[:, pad : out_len - pad]


def apply_vocos_backbone(params, feats: jax.Array, cfg: VocosConfig,
                         cond_id: Optional[jax.Array] = None,
                         cond: Optional[jax.Array] = None) -> jax.Array:
    """Embed conv + ConvNeXt blocks + final norm → [B, N, dim] (no head).

    ``cond_id``: categorical AdaLN id (EnCodec-Vocos bandwidths);
    ``cond``: continuous AdaLN condition vector [B, cond_dim] (Spark-TTS
    encoder/prenet style).
    """
    x = pad1d(feats, 3, 3, mode="constant")
    x = conv1d(x, params["embed"]["w"], params["embed"]["b"])
    if cond is not None and "adanorm_cont_in" in params:
        x = _ada_layernorm_cont(x, params["adanorm_cont_in"], cond, cfg.eps)
    elif cond_id is not None and "adanorm_in" in params:
        x = _ada_layernorm(x, params["adanorm_in"], cond_id, cfg.eps)
    else:
        x = _layernorm(x, params["norm_in"]["g"], params["norm_in"]["b"],
                       cfg.eps)
    for p in params["blocks"]:
        x = _convnext_block(x, p, cfg, cond_id, cond)
    return _layernorm(x, params["norm_out"]["g"], params["norm_out"]["b"],
                      cfg.eps)


def apply_vocos(params, feats: jax.Array, cfg: VocosConfig,
                cond_id: Optional[jax.Array] = None) -> jax.Array:
    """``feats``: [B, N, input_channels] → waveform [B, T].

    ``cond_id``: optional scalar bandwidth-id for AdaLayerNorm conditioning
    (the EnCodec-Vocos variant, reference ``encodec.py:133-138``).
    """
    x = apply_vocos_backbone(params, feats, cfg, cond_id)
    y = jnp.einsum("btc,co->bto", x, params["head"]["w"]) + params["head"]["b"]
    half = cfg.n_fft // 2 + 1
    mag = jnp.exp(jnp.clip(y[..., :half], max=100.0))
    phase = y[..., half:]
    return istft(mag * jnp.cos(phase), mag * jnp.sin(phase), cfg.n_fft,
                 cfg.hop_length)


def init_vocos_backbone_params(key, cfg: VocosConfig,
                               cond_dim: Optional[int] = None):
    """Backbone-only params (no ISTFT head); ``cond_dim`` switches the
    norms to continuous AdaLN (Spark-TTS encoder/prenet style)."""
    params = init_vocos_params(key, cfg)
    del params["head"]

    def adanorm_cont(k):
        k1, k2 = jax.random.split(k)
        return {
            "scale_w": jax.random.normal(k1, (cond_dim, cfg.dim)) * 0.02,
            "scale_b": jnp.ones((cfg.dim,)),
            "shift_w": jax.random.normal(k2, (cond_dim, cfg.dim)) * 0.02,
            "shift_b": jnp.zeros((cfg.dim,)),
        }

    if cond_dim is not None:
        keys = jax.random.split(jax.random.fold_in(key, 7),
                                cfg.num_layers + 1)
        params.pop("adanorm_in", None)
        params.pop("norm_in", None)
        params["adanorm_cont_in"] = adanorm_cont(keys[-1])
        for li, b in enumerate(params["blocks"]):
            b.pop("adanorm", None)
            b.pop("norm", None)
            b["adanorm_cont"] = adanorm_cont(keys[li])
    return params


def init_vocos_params(key, cfg: VocosConfig):
    def lin(key, i, o, scale=None):
        return {
            "w": jax.random.normal(key, (i, o)) * (scale or i**-0.5),
            "b": jnp.zeros((o,)),
        }

    def norm():
        return {"g": jnp.ones((cfg.dim,)), "b": jnp.zeros((cfg.dim,))}

    def adanorm():
        n = cfg.num_adanorm_embeddings
        return {"scale": jnp.ones((n, cfg.dim)), "shift": jnp.zeros((n, cfg.dim))}

    keys = jax.random.split(key, cfg.num_layers + 3)
    blocks = []
    for li in range(cfg.num_layers):
        k1, k2, k3 = jax.random.split(keys[li], 3)
        b = {
            "dwconv": {
                "w": jax.random.normal(k1, (7, 1, cfg.dim)) * 0.02,
                "b": jnp.zeros((cfg.dim,)),
            },
            "pw1": lin(k2, cfg.dim, cfg.intermediate_dim),
            "pw2": lin(k3, cfg.intermediate_dim, cfg.dim),
            "gamma": jnp.full((cfg.dim,), 1e-6),
        }
        if cfg.num_adanorm_embeddings:
            b["adanorm"] = adanorm()
        else:
            b["norm"] = norm()
        blocks.append(b)
    params = {
        "embed": {
            "w": jax.random.normal(keys[-3], (7, cfg.input_channels, cfg.dim))
            * 0.02,
            "b": jnp.zeros((cfg.dim,)),
        },
        "blocks": blocks,
        "norm_out": norm(),
        "head": lin(keys[-2], cfg.dim, cfg.n_fft + 2),
    }
    if cfg.num_adanorm_embeddings:
        params["adanorm_in"] = adanorm()
    else:
        params["norm_in"] = norm()
    return params
