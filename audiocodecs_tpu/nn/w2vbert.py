"""Wav2Vec2-BERT (w2v-bert-2.0) conformer encoder, TPU-native.

XCodec2's semantic branch runs ``facebook/w2v-bert-2.0`` and taps hidden
state 16 (reference ``audiocodecs/xcodec2.py:30-62`` wraps the vendor model,
whose ``semantic_model`` is HF ``Wav2Vec2BertModel``). This module is
weight-compatible with the HF implementation at its default config
(hidden 1024, 24 conformer layers, 16 heads, FFN 4096,
``position_embeddings_type='relative_key'``):

  * feature projection: LayerNorm over the 160-dim stacked-mel input, then
    a 160→1024 linear;
  * conformer layer: half-step FFN → self-attention with *relative-key*
    position scores (a [left+right+1, head_dim] distance embedding, offsets
    clamped to [-64, 8]) → conv module (pointwise→GLU→causal depthwise 31→
    LayerNorm→swish→pointwise) → half-step FFN → final LayerNorm;
  * the mel front-end reproduces HF ``SeamlessM4TFeatureExtractor``:
    kaldi fbank (povey window, 2^15 input scale) → per-utterance
    per-mel-bin normalization (ddof=1) → stride-2 frame stacking to 160.

Parity-tested against the installed ``transformers`` oracle in
``tests/test_w2vbert_parity.py`` (toy + full default config, exact layer-16
features).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from audiocodecs_tpu.nn.kaldi_fbank import kaldi_fbank
from audiocodecs_tpu.nn.layers import conv1d

__all__ = ["W2VBertConfig", "apply_w2vbert", "w2vbert_features",
           "init_w2vbert_params"]


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    input_dim: int = 160  # 80 mel bins × stride-2 stacking
    left_max_positions: int = 64
    right_max_positions: int = 8
    conv_kernel: int = 31
    layer_norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * lax.rsqrt(var + eps) * p["g"] + p["b"]


def _lin(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"],
                   precision=lax.Precision.HIGHEST)
    return y + p["b"] if "b" in p else y


def w2vbert_features(sig: jax.Array, sample_rate: int = 16000) -> jax.Array:
    """``[B, T]`` waveform → ``[B, N, 160]`` stacked normalized log-mels.

    Matches HF ``SeamlessM4TFeatureExtractor`` (povey window, kaldi banks,
    16-bit input scaling, per-mel-bin zero-mean/unit-var with ddof=1,
    stride-2 stacking; odd frame counts are padded with a zero frame, the
    extractor's ``pad_to_multiple_of=2``).
    """
    mel = kaldi_fbank(sig * 32768.0, sample_rate, num_mel_bins=80,
                      window="povey")  # [B, F, 80]
    F = mel.shape[1]
    mean = jnp.mean(mel, axis=1, keepdims=True)
    # torch-style unbiased variance (ddof=1), like the HF extractor
    var = jnp.sum((mel - mean) ** 2, axis=1, keepdims=True) / max(F - 1, 1)
    mel = (mel - mean) / jnp.sqrt(var + 1e-7)
    if F % 2:
        mel = jnp.pad(mel, ((0, 0), (0, 1), (0, 0)))
        F += 1
    return mel.reshape(mel.shape[0], F // 2, 160)


def _ffn(x, p):
    return _lin(jax.nn.silu(_lin(x, p["in"])), p["out"])


def _conv_module(x, p, cfg: W2VBertConfig):
    """Conformer conv block on channel-last ``[B, T, C]``."""
    x = _ln(x, p["ln"], cfg.layer_norm_eps)
    h = jnp.einsum("btc,cd->btd", x, p["pw1"],
                   precision=lax.Precision.HIGHEST)  # [B, T, 2C]
    a, b = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(b)  # GLU (torch splits channels the same way)
    h = jnp.pad(h, ((0, 0), (cfg.conv_kernel - 1, 0), (0, 0)))  # causal
    h = conv1d(h, p["dw"], groups=cfg.hidden_size,
               precision=lax.Precision.HIGHEST)
    h = _ln(h, p["dw_ln"], cfg.layer_norm_eps)
    h = jax.nn.silu(h)
    return jnp.einsum("btc,cd->btd", h, p["pw2"],
                      precision=lax.Precision.HIGHEST)


def _attention(x, p, cfg: W2VBertConfig, rel_scores_tmpl):
    B, T, _ = x.shape
    H, D = cfg.num_heads, cfg.head_dim
    q = _lin(x, p["q"]).reshape(B, T, H, D)
    k = _lin(x, p["k"]).reshape(B, T, H, D)
    v = _lin(x, p["v"]).reshape(B, T, H, D)
    scores = jnp.einsum("bthd,bshd->bhts", q, k,
                        precision=lax.Precision.HIGHEST)
    # relative-key positional scores: dist_emb[clamp(s-t)] dotted with q
    posemb = jnp.take(p["dist_emb"], rel_scores_tmpl, axis=0)  # [T, T, D]
    rel = jnp.einsum("bthd,tsd->bhts", q, posemb,
                     precision=lax.Precision.HIGHEST)
    scores = (scores + rel) * (D**-0.5)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    a = jnp.einsum("bhts,bshd->bthd", probs, v,
                   precision=lax.Precision.HIGHEST)
    return _lin(a.reshape(B, T, H * D), p["o"])


def _layer(x, p, cfg: W2VBertConfig, rel_idx):
    r = x
    x = _ln(x, p["ffn1_ln"], cfg.layer_norm_eps)
    x = _ffn(x, p["ffn1"]) * 0.5 + r
    r = x
    x = _ln(x, p["attn_ln"], cfg.layer_norm_eps)
    x = _attention(x, p["attn"], cfg, rel_idx) + r
    x = x + _conv_module(x, p["conv"], cfg)
    r = x
    x = _ln(x, p["ffn2_ln"], cfg.layer_norm_eps)
    x = _ffn(x, p["ffn2"]) * 0.5 + r
    return _ln(x, p["final_ln"], cfg.layer_norm_eps)


def apply_w2vbert(params, feats: jax.Array, cfg: W2VBertConfig,
                  output_layer: int | None = None,
                  output_hidden_states: bool = False):
    """``[B, N, input_dim]`` features → hidden states ``[B, N, hidden]``.

    ``output_layer`` follows the HF ``hidden_states`` indexing: 0 is the
    feature-projection output, ``i`` the output of conformer layer ``i``.
    """
    x = _ln(feats, params["proj_ln"], cfg.layer_norm_eps)
    x = _lin(x, params["proj"])

    T = x.shape[1]
    dist = np.arange(T)[None, :] - np.arange(T)[:, None]
    dist = np.clip(dist, -cfg.left_max_positions, cfg.right_max_positions)
    rel_idx = jnp.asarray(dist + cfg.left_max_positions)  # [T, T]

    hidden = [x]
    for p in params["layers"]:
        x = _layer(x, p, cfg, rel_idx)
        hidden.append(x)
        if output_layer is not None and len(hidden) - 1 == output_layer:
            break
    if output_hidden_states:
        return jnp.stack(hidden)
    if output_layer is not None:
        return hidden[output_layer]
    return x


def init_w2vbert_params(key, cfg: W2VBertConfig):
    C, I = cfg.hidden_size, cfg.intermediate_size
    n_pos = cfg.left_max_positions + cfg.right_max_positions + 1

    def lin(key, i, o):
        return {"w": jax.random.normal(key, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    def norm():
        return {"g": jnp.ones((C,)), "b": jnp.zeros((C,))}

    def layer(key):
        ks = jax.random.split(key, 12)
        return {
            "ffn1_ln": norm(),
            "ffn1": {"in": lin(ks[0], C, I), "out": lin(ks[1], I, C)},
            "attn_ln": norm(),
            "attn": {
                "q": lin(ks[2], C, C), "k": lin(ks[3], C, C),
                "v": lin(ks[4], C, C), "o": lin(ks[5], C, C),
                "dist_emb": jax.random.normal(ks[6], (n_pos, cfg.head_dim))
                * 0.02,
            },
            "conv": {
                "ln": norm(),
                "pw1": jax.random.normal(ks[7], (C, 2 * C)) * C**-0.5,
                "dw": jax.random.normal(ks[8], (cfg.conv_kernel, 1, C))
                * cfg.conv_kernel**-0.5,
                "dw_ln": norm(),
                "pw2": jax.random.normal(ks[9], (C, C)) * C**-0.5,
            },
            "ffn2_ln": norm(),
            "ffn2": {"in": lin(ks[10], C, I), "out": lin(ks[11], I, C)},
            "final_ln": norm(),
        }

    k0, k1, *lk = jax.random.split(key, 2 + cfg.num_layers)
    return {
        "proj_ln": {"g": jnp.ones((cfg.input_dim,)),
                    "b": jnp.zeros((cfg.input_dim,))},
        "proj": lin(k1, cfg.input_dim, C),
        "layers": [layer(k) for k in lk],
    }
