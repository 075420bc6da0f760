"""First-party on-device dWER: JAX Whisper transcription + byte-level decode.

The reference's dWER downloads a faster-whisper model and transcribes on
the host GPU (reference ``downstream/metrics/dwer.py:33-115``). This module
is the first-party TPU path: a converted HF Whisper checkpoint
(:mod:`audiocodecs_tpu.convert.whisper`) runs the
:func:`audiocodecs_tpu.nn.whisper.whisper_generate` greedy scan on-device,
and the emitted token ids are decoded to text with a pure-Python byte-level
BPE *decoder* driven by the checkpoint's ``vocab.json`` — no torch, no
``transformers`` at metric time.

Decoding (unlike encoding) needs no merge ranks: it is the fixed GPT-2
byte-level map ``id → token string → bytes → utf-8``, so ``vocab.json``
(+ optional ``added_tokens.json`` for the special-token ids) is the entire
tokenizer dependency.
"""

from __future__ import annotations

import functools
import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.metrics.base import MetricStats
from audiocodecs_tpu.downstream.metrics.external import word_error_rate
from audiocodecs_tpu.utils.bytebpe import ByteLevelBPE

__all__ = [
    "ByteLevelDecoder",
    "make_dwer_jax_metric",
    "whisper_forced_tokens",
]

_WHISPER_SR = 16000
_CHUNK = 30 * _WHISPER_SR  # Whisper's fixed 30 s analysis window

# dWER only needs the decode direction; the full encoder/decoder lives in
# utils/bytebpe (ASR perplexity encodes text through the same class).
ByteLevelDecoder = ByteLevelBPE


def whisper_forced_tokens(decoder: ByteLevelBPE,
                          decoder_start_token: int,
                          language: str = "en",
                          task: str = "transcribe") -> list[int]:
    """The greedy prompt: ``<|startoftranscript|><|lang|><|task|><|notimestamps|>``.

    English-only checkpoints (no ``<|en|>`` token) get just
    ``[start, <|notimestamps|>]``, matching HF's generation config.
    """
    toks = [decoder_start_token]
    try:
        toks.append(decoder.token_id(f"<|{language}|>"))
        toks.append(decoder.token_id(f"<|{task}|>"))
    except KeyError:
        pass  # english-only model: no language/task tokens
    try:
        toks.append(decoder.token_id("<|notimestamps|>"))
    except KeyError:
        pass
    return toks


def make_dwer_jax_metric(
    params_path: str,
    tokenizer_path: str,
    cfg=None,
    language: str = "en",
    max_new_tokens: int = 224,
    batch_size: int = 8,
) -> MetricStats:
    """On-device dWER from a converted Whisper ``.npz`` + its tokenizer dir.

    Transcribes hypothesis and reference signals with the first-party JAX
    Whisper (30 s pad/trim, single window — the reference's dWER operates
    on utterance-length eval clips) and scores WER between the two
    transcripts, lowercased/stripped like the reference
    (``downstream/metrics/dwer.py:100-109``).
    """
    from audiocodecs_tpu.nn.whisper import (
        WhisperConfig,
        log_mel_spectrogram,
        whisper_generate,
    )
    from audiocodecs_tpu.utils.checkpoint import load_params

    if cfg is None:
        cfg_json = os.path.join(tokenizer_path, "config.json")
        if os.path.exists(cfg_json):
            with open(cfg_json, encoding="utf-8") as f:
                hf = json.load(f)
            cfg = WhisperConfig(
                vocab_size=hf["vocab_size"],
                num_mel_bins=hf["num_mel_bins"],
                d_model=hf["d_model"],
                encoder_layers=hf["encoder_layers"],
                encoder_heads=hf["encoder_attention_heads"],
                decoder_layers=hf["decoder_layers"],
                decoder_heads=hf["decoder_attention_heads"],
                encoder_ffn=hf["encoder_ffn_dim"],
                decoder_ffn=hf["decoder_ffn_dim"],
                max_source_positions=hf["max_source_positions"],
                max_target_positions=hf["max_target_positions"],
                eos_token=hf["eos_token_id"],
                decoder_start_token=hf["decoder_start_token_id"],
            )
        else:
            cfg = WhisperConfig()
    params = jax.device_put(load_params(params_path))
    decoder = ByteLevelDecoder.from_dir(tokenizer_path)
    forced = tuple(whisper_forced_tokens(decoder, cfg.decoder_start_token,
                                         language))

    @functools.partial(jax.jit, static_argnames=("chunk",))
    def _transcribe_batch(p, wav, chunk=_CHUNK):
        mel = log_mel_spectrogram(wav, cfg.num_mel_bins)
        return whisper_generate(p, cfg, mel, list(forced),
                                max_new_tokens=max_new_tokens)

    def transcribe(sigs, sample_rate: int) -> list[str]:
        if sample_rate != _WHISPER_SR:
            from audiocodecs_tpu.resample import resample

            sigs = [np.asarray(resample(jnp.asarray(
                np.asarray(s, np.float32))[None], sample_rate,
                _WHISPER_SR))[0] for s in sigs]
        texts = []
        for start in range(0, len(sigs), batch_size):
            group = sigs[start:start + batch_size]
            wav = np.zeros((len(group), _CHUNK), np.float32)
            for b, s in enumerate(group):
                s = np.asarray(s, np.float32)[:_CHUNK]
                wav[b, : s.size] = s
            toks, lengths = _transcribe_batch(params, jnp.asarray(wav))
            toks, lengths = np.asarray(toks), np.asarray(lengths)
            texts.extend(decoder.decode(toks[b, : lengths[b]])
                         for b in range(len(group)))
        return texts

    def metric(hyp_sigs, ref_sigs, sample_rate: int):
        hyp_texts = transcribe(hyp_sigs, sample_rate)
        ref_texts = transcribe(ref_sigs, sample_rate)
        return [
            word_error_rate([h.lower().strip()], [r.lower().strip()])
            for h, r in zip(hyp_texts, ref_texts)
        ]

    stats = MetricStats(metric, name="dWER")
    stats.transcribe = transcribe
    return stats
