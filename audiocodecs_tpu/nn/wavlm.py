"""WavLM SSL encoder, TPU-native.

Powers the WavLM+K-means codec family (reference
``audiocodecs/wavlm_kmeans.py:30-137``) and the speaker-embedding stack
(reference ``downstream/models/speaker_encoder.py:31-68`` wraps a WavLM
x-vector model). Weight-compatible with HF ``WavLMModel`` (base, post-norm):

  * conv feature extractor: 7 conv layers (512 ch; kernels 10,3,3,3,3,2,2;
    strides 5,2,2,2,2,2,2; GroupNorm after the first), GELU;
  * feature projection LayerNorm + 512→768 linear;
  * positional conv embedding (k=128, groups=16, weight-norm over the kernel
    axis, even-kernel same-pad trim) added to the input;
  * transformer layers with **gated relative position bias**: T5-style
    bucketed bias (320 buckets, max distance 800) computed once, then scaled
    per layer by a GRU-style gate of the query states.
"""

from __future__ import annotations

import dataclasses
import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audiocodecs_tpu.nn.layers import conv1d

__all__ = ["WavLMConfig", "apply_wavlm", "wavlm_feature_extractor"]


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_distance: int = 800
    layer_norm_eps: float = 1e-5
    # WavLM-large (microsoft/wavlm-large, the reference's WavLM+k-means
    # default, ``wavlm_kmeans.py:49``) uses the *pre-norm* encoder and a
    # per-conv-layer LayerNorm feature extractor with conv biases.
    do_stable_layer_norm: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    # False → plain softmax attention without the bucketed bias / GRU gate:
    # exactly HF ``Wav2Vec2Model`` (e.g. wav2vec2-large-xlsr-53, BiCodec's
    # semantic feature extractor).
    gated_rel_pos: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def wavlm_large_config() -> "WavLMConfig":
    """microsoft/wavlm-large shape (HF defaults for the released model)."""
    return WavLMConfig(
        hidden_size=1024, num_layers=24, num_heads=16,
        intermediate_size=4096, conv_bias=True,
        do_stable_layer_norm=True, feat_extract_norm="layer",
    )


def wav2vec2_xlsr_config() -> "WavLMConfig":
    """facebook/wav2vec2-large-xlsr-53 shape (plain attention; BiCodec's
    feature extractor, reference ``bicodec.py`` via Spark-TTS)."""
    return WavLMConfig(
        hidden_size=1024, num_layers=24, num_heads=16,
        intermediate_size=4096, conv_bias=True,
        do_stable_layer_norm=True, feat_extract_norm="layer",
        gated_rel_pos=False,
    )


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lin(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"],
                   precision=lax.Precision.HIGHEST)
    return y + p["b"] if "b" in p else y


def wavlm_feature_extractor(params, sig: jax.Array, cfg: WavLMConfig):
    """``[B, T]`` waveform → ``[B, N, conv_dim[-1]]`` conv features."""
    x = sig[:, :, None]
    for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
        p = params["conv_layers"][i]
        x = conv1d(x, p["w"], p.get("b"), stride=s)
        if i == 0 and "gn" in p:
            # GroupNorm with groups == channels: per-channel instance norm
            # over time.
            mean = jnp.mean(x, axis=1, keepdims=True)
            var = jnp.var(x, axis=1, keepdims=True)
            x = (x - mean) * lax.rsqrt(var + 1e-5)
            x = x * p["gn"]["g"] + p["gn"]["b"]
        elif "ln" in p:  # "layer" norm mode (WavLM-large): per-layer LN
            x = _ln(x, p["ln"], 1e-5)
        x = jax.nn.gelu(x, approximate=False)
    return x


@lru_cache(maxsize=None)
def _rel_pos_buckets(q_len: int, k_len: int, num_buckets: int,
                     max_distance: int) -> np.ndarray:
    """T5-style log-bucketed relative positions (trace-time constant)."""
    half = num_buckets // 2
    ctx = np.arange(q_len)[:, None]
    mem = np.arange(k_len)[None, :]
    rel = mem - ctx
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    is_small = rel < max_exact
    large = (
        max_exact
        + (
            np.log(np.maximum(rel, 1) / max_exact)
            / math.log(max_distance / max_exact)
            * (half - max_exact)
        )
    ).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(is_small, rel, large)
    return buckets


def _gated_attention(x, p, cfg: WavLMConfig, position_bias):
    """WavLM attention core on (already-normed, for pre-norm) ``x``;
    ``position_bias``: [H, T, T] (ungated), or None for plain wav2vec2
    attention."""
    B, T, _ = x.shape
    H, D = cfg.num_heads, cfg.head_dim

    gated_bias = None
    if position_bias is not None:
        # GRU-style gate over the *hidden states* per head (HF: projects the
        # head-split hidden states with an 8-dim linear, sums pairs of 4).
        gated = x.reshape(B, T, H, D)
        proj = jnp.einsum("bthd,de->bthe", gated, p["gru_w"]) + p["gru_b"]
        proj = proj.reshape(B, T, H, 2, 4).sum(-1)
        gate_a, gate_b = jnp.split(jax.nn.sigmoid(proj), 2, axis=-1)
        gate = gate_a * (gate_b * p["gru_const"] - 1.0) + 2.0  # [B,T,H,1]
        gated_bias = (
            gate.transpose(0, 2, 1, 3) * position_bias[None]
        )  # [B, H, T, 1]·[1, H, T, T]

    q = _lin(x, p["q"]).reshape(B, T, H, D) * (D**-0.5)
    k = _lin(x, p["k"]).reshape(B, T, H, D)
    v = _lin(x, p["v"]).reshape(B, T, H, D)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        precision=lax.Precision.HIGHEST)
    if gated_bias is not None:
        scores = scores + gated_bias
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum("bhts,bshd->bthd", probs, v,
                   precision=lax.Precision.HIGHEST)
    return _lin(a.reshape(B, T, H * D), p["o"])


def _attention_layer(x, p, cfg: WavLMConfig, position_bias):
    """One WavLM layer — post-norm (base) or pre-norm (large/stable-LN)."""
    if cfg.do_stable_layer_norm:
        a = _gated_attention(_ln(x, p["ln1"], cfg.layer_norm_eps), p, cfg,
                             position_bias)
        x = x + a
        h = _ln(x, p["ln2"], cfg.layer_norm_eps)
        ff = _lin(jax.nn.gelu(_lin(h, p["ff1"]), approximate=False),
                  p["ff2"])
        return x + ff
    a = _gated_attention(x, p, cfg, position_bias)
    x = _ln(x + a, p["ln1"], cfg.layer_norm_eps)
    ff = _lin(jax.nn.gelu(_lin(x, p["ff1"]), approximate=False), p["ff2"])
    return _ln(x + ff, p["ln2"], cfg.layer_norm_eps)


def apply_wavlm(params, sig: jax.Array, cfg: WavLMConfig,
                output_layer: int | None = None,
                output_hidden_states: bool = False,
                final_ln_tap: bool = True):
    """``[B, T]`` waveform → final hidden states ``[B, N, hidden]`` (or all
    layer outputs when ``output_hidden_states``).

    ``final_ln_tap`` (stable-LN configs only): HF applies the final encoder
    LayerNorm to the LAST ``hidden_states`` entry (and to
    ``output_layer == num_layers`` taps) — that is the parity default.
    Truncated towers emulating an interior tap of a deeper model (e.g.
    FocalCodec's 6-of-24-layer WavLM) pass ``False`` to keep the tap
    un-normed, as the interior entry of the full model would be."""
    feats = wavlm_feature_extractor(params["feature_extractor"], sig, cfg)
    x = _ln(feats, params["proj_ln"], cfg.layer_norm_eps)
    x = _lin(x, params["proj"])

    # positional conv embedding (even kernel → same-pad trims one output)
    pc = params["pos_conv"]
    pad = cfg.num_conv_pos_embeddings // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    pos = conv1d(xp, pc["w"], pc["b"],
                 groups=cfg.num_conv_pos_embedding_groups)
    if cfg.num_conv_pos_embeddings % 2 == 0:
        pos = pos[:, :-1]
    x = x + jax.nn.gelu(pos, approximate=False)
    if not cfg.do_stable_layer_norm:
        # base (post-norm) applies the encoder LayerNorm BEFORE the layers;
        # the stable-LN (large) variant applies it after the last layer
        x = _ln(x, params["encoder_ln"], cfg.layer_norm_eps)

    position_bias = None
    if cfg.gated_rel_pos:
        T = x.shape[1]
        buckets = jnp.asarray(
            _rel_pos_buckets(T, T, cfg.num_buckets, cfg.max_distance)
        )
        position_bias = jnp.take(params["rel_attn_embed"], buckets, axis=0)
        position_bias = jnp.transpose(position_bias, (2, 0, 1))  # [H, T, T]

    hidden = [x]
    for p in params["layers"]:
        x = _attention_layer(x, p, cfg, position_bias)
        hidden.append(x)
        if output_layer is not None and len(hidden) - 1 == output_layer:
            break
    full_depth = len(hidden) - 1 == cfg.num_layers
    if cfg.do_stable_layer_norm and final_ln_tap and full_depth:
        # HF semantics: the final entry is post-final-LN
        hidden[-1] = _ln(hidden[-1], params["encoder_ln"],
                         cfg.layer_norm_eps)
        x = hidden[-1]
    elif cfg.do_stable_layer_norm and output_layer is None and (
            not output_hidden_states):
        x = _ln(x, params["encoder_ln"], cfg.layer_norm_eps)
    if output_hidden_states:
        return jnp.stack(hidden)
    if output_layer is not None:
        return hidden[output_layer]
    return x
