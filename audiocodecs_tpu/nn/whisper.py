"""First-party Whisper (encoder–decoder ASR) in JAX.

The reference computes dWER and ASR-perplexity by downloading a
faster-whisper model at runtime and transcribing on the host
(``/root/reference/downstream/metrics/dwer.py:33-49``,
``/root/reference/downstream/metrics/perplexity.py:33-57``). Here the
Whisper forward runs fully on-device from a converted HF
``WhisperForConditionalGeneration`` checkpoint
(:func:`audiocodecs_tpu.convert.whisper.convert_whisper_state_dict`),
so dWER / PPL transcription needs no torch at eval time.

TPU-first design notes:
  * log-mel frontend is one jitted gather + rfft + matmul (static 30 s
    window, reflect-centered frames — OpenAI/HF numerics);
  * encoder/decoder reuse the shared MXU attention / linear / norm
    helpers (:mod:`audiocodecs_tpu.nn.transformer`); absolute learned
    positions (no RoPE), pre-LN, biased q/v/o with bias-free k — the
    Whisper layout;
  * greedy decoding is one ``lax.scan`` over steps with a
    fixed-capacity self-attention KV cache
    (``lax.dynamic_update_slice``) and per-layer cross-attention K/V
    precomputed once from the encoder states; EOS handled with an
    alive mask (same scheme as ``downstream/models/llama.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from audiocodecs_tpu.nn.transformer import _linear, _norm, attention, causal_mask
from audiocodecs_tpu.utils.melbank import mel_filterbank_slaney

__all__ = [
    "WhisperConfig",
    "init_whisper_params",
    "log_mel_spectrogram",
    "whisper_encode",
    "whisper_decode",
    "whisper_generate",
]

_SAMPLE_RATE = 16000
_N_FFT = 400
_HOP = 160
_CHUNK_S = 30.0


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    """Mirrors the HF ``WhisperConfig`` fields the forward needs."""

    vocab_size: int = 51865
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_heads: int = 6
    decoder_layers: int = 4
    decoder_heads: int = 6
    encoder_ffn: int = 1536
    decoder_ffn: int = 1536
    max_source_positions: int = 1500
    max_target_positions: int = 448
    eos_token: int = 50257
    decoder_start_token: int = 50258
    norm_eps: float = 1e-5

    @property
    def enc_head_dim(self) -> int:
        return self.d_model // self.encoder_heads

    @property
    def dec_head_dim(self) -> int:
        return self.d_model // self.decoder_heads

    # one field map shared by the checkpoint converter (attr-based HF
    # config) and the metric loader (config.json dict) — keep in sync in
    # exactly one place
    _HF_FIELDS = {
        "vocab_size": "vocab_size",
        "num_mel_bins": "num_mel_bins",
        "d_model": "d_model",
        "encoder_layers": "encoder_layers",
        "encoder_heads": "encoder_attention_heads",
        "decoder_layers": "decoder_layers",
        "decoder_heads": "decoder_attention_heads",
        "encoder_ffn": "encoder_ffn_dim",
        "decoder_ffn": "decoder_ffn_dim",
        "max_source_positions": "max_source_positions",
        "max_target_positions": "max_target_positions",
        "eos_token": "eos_token_id",
        "decoder_start_token": "decoder_start_token_id",
    }

    @classmethod
    def from_hf_dict(cls, d: dict) -> "WhisperConfig":
        """Build from an HF ``config.json`` dict (KeyError on missing)."""
        return cls(**{ours: d[hf] for ours, hf in cls._HF_FIELDS.items()})

    @property
    def multilingual(self) -> bool:
        """Released-checkpoint heuristic: ``.en`` models have vocab 51864
        (their tokenizers still *contain* the language tokens, so vocab
        membership cannot distinguish them — HF forces only
        ``[sot, notimestamps]`` for them)."""
        return self.vocab_size != 51864


# --------------------------------------------------------------------- #
# Log-mel frontend (OpenAI/HF WhisperFeatureExtractor numerics)
# --------------------------------------------------------------------- #


def log_mel_spectrogram(wav: jax.Array, num_mel_bins: int = 80) -> jax.Array:
    """``wav`` [B, T] at 16 kHz → log-mel features [B, n_frames, n_mels].

    Matches HF ``WhisperFeatureExtractor``: hann-400 / hop-160 centered
    (reflect) power spectrogram with the last frame dropped, slaney mel,
    ``log10(clamp(·, 1e-10))``, per-sample dynamic-range floor at
    ``max − 8``, then ``(x + 4) / 4``. Pad/trim to 30 s beforehand for
    checkpoint-exact behavior (Whisper is trained on 30 s windows).
    """
    B, T = wav.shape
    pad = _N_FFT // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = T // _HOP  # centered stft has 1 + T//hop; whisper drops last
    idx = jnp.arange(n_frames)[:, None] * _HOP + jnp.arange(_N_FFT)[None, :]
    frames = x[:, idx]  # [B, F, 400]
    window = jnp.asarray(np.hanning(_N_FFT + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames * window, axis=-1)
    power = (spec.real**2 + spec.imag**2).astype(jnp.float32)
    mel_f = jnp.asarray(
        mel_filterbank_slaney(_SAMPLE_RATE, _N_FFT, num_mel_bins)
    )  # [M, 201]
    mel = jnp.einsum("bfk,mk->bfm", power, mel_f,
                     precision=lax.Precision.HIGHEST)
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, floor) + 4.0) / 4.0


# --------------------------------------------------------------------- #
# Parameters
# --------------------------------------------------------------------- #


def _lin_p(key, i, o, bias=True):
    p = {"w": jax.random.normal(key, (i, o)) * (i**-0.5)}
    if bias:
        p["b"] = jnp.zeros((o,))
    return p


def _ln_p(d):
    return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}


def _attn_p(key, d, kv_d=None):
    kv_d = kv_d or d
    ks = jax.random.split(key, 4)
    return {
        "q": _lin_p(ks[0], d, d),
        "k": _lin_p(ks[1], kv_d, d, bias=False),  # whisper: k has no bias
        "v": _lin_p(ks[2], kv_d, d),
        "o": _lin_p(ks[3], d, d),
    }


def _sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal encoder positions."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def init_whisper_params(key, cfg: WhisperConfig):
    d = cfg.d_model
    keys = iter(jax.random.split(key, 16 + 8 * (cfg.encoder_layers
                                                + cfg.decoder_layers)))

    def enc_layer():
        return {
            "ln1": _ln_p(d),
            "attn": _attn_p(next(keys), d),
            "ln2": _ln_p(d),
            "mlp": {"fc1": _lin_p(next(keys), d, cfg.encoder_ffn),
                    "fc2": _lin_p(next(keys), cfg.encoder_ffn, d)},
        }

    def dec_layer():
        return {
            "ln1": _ln_p(d),
            "self_attn": _attn_p(next(keys), d),
            "ln_x": _ln_p(d),
            "cross_attn": _attn_p(next(keys), d),
            "ln2": _ln_p(d),
            "mlp": {"fc1": _lin_p(next(keys), d, cfg.decoder_ffn),
                    "fc2": _lin_p(next(keys), cfg.decoder_ffn, d)},
        }

    return {
        "encoder": {
            "conv1": {"w": jax.random.normal(next(keys),
                                             (3, cfg.num_mel_bins, d))
                      * (3 * cfg.num_mel_bins) ** -0.5,
                      "b": jnp.zeros((d,))},
            "conv2": {"w": jax.random.normal(next(keys), (3, d, d))
                      * (3 * d) ** -0.5,
                      "b": jnp.zeros((d,))},
            "pos": jnp.asarray(_sinusoids(cfg.max_source_positions, d)),
            "layers": [enc_layer() for _ in range(cfg.encoder_layers)],
            "ln_post": _ln_p(d),
        },
        "decoder": {
            "embed": jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02,
            "pos": jax.random.normal(next(keys),
                                     (cfg.max_target_positions, d)) * 0.02,
            "layers": [dec_layer() for _ in range(cfg.decoder_layers)],
            "ln_post": _ln_p(d),
        },
    }


# --------------------------------------------------------------------- #
# Encoder
# --------------------------------------------------------------------- #


def _conv1d_ntc(x, p, stride=1):
    """x [B, T, C] · w [K, C, O] (pad 1, whisper stem)."""
    y = lax.conv_general_dilated(
        x, p["w"], window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NTC", "TIO", "NTC"),
        precision=lax.Precision.HIGHEST,
    )
    return y + p["b"]


def _mha(h, p, num_heads, head_dim, kv=None, mask=None):
    """Pre-normed hidden [B, T, D] → attention output [B, T, D].

    ``kv``: source states for cross-attention (defaults to ``h``).
    Whisper scales the query by ``head_dim**-0.5`` (HF modeling_whisper);
    the shared :func:`attention` applies the same factor internally.
    """
    B, T, D = h.shape
    src = h if kv is None else kv
    S = src.shape[1]
    q = _linear(h, p["q"]).reshape(B, T, num_heads, head_dim)
    k = _linear(src, p["k"]).reshape(B, S, num_heads, head_dim)
    v = _linear(src, p["v"]).reshape(B, S, num_heads, head_dim)
    out = attention(q, k, v, mask)
    return _linear(out.reshape(B, T, D), p["o"])


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def whisper_encode(params, mel: jax.Array, cfg: WhisperConfig) -> jax.Array:
    """Log-mel features [B, F, M] → encoder states [B, F//2, D]."""
    enc = params["encoder"]
    x = _gelu(_conv1d_ntc(mel, enc["conv1"]))
    x = _gelu(_conv1d_ntc(x, enc["conv2"], stride=2))
    x = x + enc["pos"][None, : x.shape[1]]
    for p in enc["layers"]:
        h = _norm(x, p["ln1"], "layernorm", cfg.norm_eps)
        x = x + _mha(h, p["attn"], cfg.encoder_heads, cfg.enc_head_dim)
        h = _norm(x, p["ln2"], "layernorm", cfg.norm_eps)
        x = x + _linear(_gelu(_linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    return _norm(x, enc["ln_post"], "layernorm", cfg.norm_eps)


# --------------------------------------------------------------------- #
# Decoder (full-sequence forward — training / PPL scoring)
# --------------------------------------------------------------------- #


def whisper_decode(params, tokens: jax.Array, enc_states: jax.Array,
                   cfg: WhisperConfig) -> jax.Array:
    """Token ids [B, L] + encoder states → logits [B, L, vocab].

    Output projection is tied to the token embedding (HF ``proj_out``)."""
    dec = params["decoder"]
    B, L = tokens.shape
    x = jnp.take(dec["embed"], tokens, axis=0) + dec["pos"][None, :L]
    mask = causal_mask(L, L)[None, None, None]
    for p in dec["layers"]:
        h = _norm(x, p["ln1"], "layernorm", cfg.norm_eps)
        x = x + _mha(h, p["self_attn"], cfg.decoder_heads, cfg.dec_head_dim,
                     mask=mask)
        h = _norm(x, p["ln_x"], "layernorm", cfg.norm_eps)
        x = x + _mha(h, p["cross_attn"], cfg.decoder_heads, cfg.dec_head_dim,
                     kv=enc_states)
        h = _norm(x, p["ln2"], "layernorm", cfg.norm_eps)
        x = x + _linear(_gelu(_linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    x = _norm(x, dec["ln_post"], "layernorm", cfg.norm_eps)
    return jnp.einsum("bld,vd->blv", x, dec["embed"],
                      precision=lax.Precision.HIGHEST)


# --------------------------------------------------------------------- #
# Greedy generation (KV-cached scan)
# --------------------------------------------------------------------- #


def _dec_step(params, cfg, tok_emb, enc_kv, cache, pos, capacity,
              logits_embed=None):
    """One decode step. ``tok_emb`` [B, 1, D]; returns (logits [B, V], cache).

    ``logits_embed``: optional f32 embedding matrix for the final logits
    projection (used by the bf16 decode path to keep argmax resolution)."""
    dec = params["decoder"]
    Hd, Dd = cfg.decoder_heads, cfg.dec_head_dim
    x = tok_emb
    new_k, new_v = [], []
    for li, p in enumerate(dec["layers"]):
        B = x.shape[0]
        h = _norm(x, p["ln1"], "layernorm", cfg.norm_eps)
        q = _linear(h, p["self_attn"]["q"]).reshape(B, 1, Hd, Dd)
        k = _linear(h, p["self_attn"]["k"]).reshape(B, 1, Hd, Dd)
        v = _linear(h, p["self_attn"]["v"]).reshape(B, 1, Hd, Dd)
        kc = lax.dynamic_update_slice(cache["k"][li], k, (0, pos, 0, 0))
        vc = lax.dynamic_update_slice(cache["v"][li], v, (0, pos, 0, 0))
        valid = (jnp.arange(capacity) <= pos)[None, None, None, None, :]
        mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
        a = attention(q, kc, vc, mask)
        x = x + _linear(a.reshape(B, 1, Hd * Dd), p["self_attn"]["o"])
        h = _norm(x, p["ln_x"], "layernorm", cfg.norm_eps)
        qx = _linear(h, p["cross_attn"]["q"]).reshape(B, 1, Hd, Dd)
        a = attention(qx, enc_kv[li]["k"], enc_kv[li]["v"])
        x = x + _linear(a.reshape(B, 1, Hd * Dd), p["cross_attn"]["o"])
        h = _norm(x, p["ln2"], "layernorm", cfg.norm_eps)
        x = x + _linear(_gelu(_linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
        new_k.append(kc)
        new_v.append(vc)
    cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    x = _norm(x, dec["ln_post"], "layernorm", cfg.norm_eps)
    embed = dec["embed"] if logits_embed is None else logits_embed
    logits = jnp.einsum("bd,vd->bv", x[:, 0].astype(embed.dtype), embed,
                        precision=lax.Precision.HIGHEST)
    return logits, cache


def whisper_generate(
    params,
    cfg: WhisperConfig,
    mel: jax.Array,
    forced_tokens: Sequence[int],
    max_new_tokens: int = 224,
    enc_states: Optional[jax.Array] = None,
    decode_dtype: Optional[jnp.dtype] = None,
):
    """Greedy transcription. Returns (tokens [B, max_new], lengths [B]).

    ``forced_tokens``: the decoder prompt (start-of-transcript, language,
    task, no-timestamps — the caller supplies ids, matching the
    faster-whisper greedy path the reference uses for dWER). Lengths
    count tokens before the first EOS.

    ``decode_dtype=jnp.bfloat16`` streams the decoder weights + KV cache
    in bf16 through the greedy scan (the scan is HBM-bound on weights at
    batch ≤32 — see ``tools/bench_whisper.py``); attention scores/softmax
    stay f32 inside :func:`audiocodecs_tpu.nn.transformer.attention`.
    Greedy argmax can flip on near-tied logits, so this is opt-in —
    measure token match for your checkpoint before serving with it.
    """
    if enc_states is None:
        enc_states = whisper_encode(params, mel, cfg)
    dec = params["decoder"]
    logits_embed = None
    if decode_dtype is not None:
        # the final logits projection keeps an f32 embed copy: argmax
        # resolution costs one extra f32 matrix read per step, the bulk
        # HBM saving (layer weights + KV cache) is untouched
        logits_embed = jnp.asarray(dec["embed"], jnp.float32)
        dec = jax.tree.map(
            lambda a: a.astype(decode_dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, dec)
        enc_states = enc_states.astype(decode_dtype)
        params = {**params, "decoder": dec}  # _dec_step reads params
    cdtype = decode_dtype or jnp.float32
    Hd, Dd = cfg.decoder_heads, cfg.dec_head_dim
    B = enc_states.shape[0]
    S = enc_states.shape[1]
    enc_kv = [
        {"k": _linear(enc_states, p["cross_attn"]["k"]).reshape(B, S, Hd, Dd),
         "v": _linear(enc_states, p["cross_attn"]["v"]).reshape(B, S, Hd, Dd)}
        for p in dec["layers"]
    ]
    L = len(forced_tokens)
    capacity = L + max_new_tokens
    nl = cfg.decoder_layers
    cache = {"k": jnp.zeros((nl, B, capacity, Hd, Dd), cdtype),
             "v": jnp.zeros((nl, B, capacity, Hd, Dd), cdtype)}
    # prefill the forced prompt one token at a time through the same step
    # function (prompts are ≤ 4 tokens — not worth a second traced path)
    logits = None
    for i, t in enumerate(forced_tokens):
        emb = (dec["embed"][t] + dec["pos"][i])[None, None].repeat(B, axis=0)
        logits, cache = _dec_step(params, cfg, emb, enc_kv, cache, i, capacity,
                                  logits_embed)

    def step(carry, i):
        cache, last_logits, alive = carry
        tok = jnp.argmax(last_logits, axis=-1).astype(jnp.int32)
        tok = jnp.where(alive, tok, cfg.eos_token)
        emb = (jnp.take(dec["embed"], tok, axis=0)
               + jnp.take(dec["pos"], L + i, axis=0))[:, None]
        new_logits, cache = _dec_step(params, cfg, emb, enc_kv, cache,
                                      L + i, capacity, logits_embed)
        alive = alive & (tok != cfg.eos_token)
        return (cache, new_logits, alive), tok

    (_, _, _), toks = lax.scan(
        step, (cache, logits, jnp.ones((B,), bool)),
        jnp.arange(max_new_tokens))
    toks = jnp.swapaxes(toks, 0, 1)
    lengths = jnp.sum(
        jnp.cumprod((toks != cfg.eos_token).astype(jnp.int32), axis=1), axis=1
    )
    return toks, lengths
