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
from audiocodecs_tpu.downstream.metrics.external import (
    char_error_rate,
    word_error_rate,
)
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
                          task: str = "transcribe",
                          multilingual: bool | None = None) -> list[int]:
    """The greedy prompt: ``<|startoftranscript|><|lang|><|task|><|notimestamps|>``.

    English-only (``.en``) checkpoints get just ``[start, <|notimestamps|>]``
    — HF's generation config; they were never trained with language/task
    tokens (their *tokenizers* still contain those tokens, so pass
    ``multilingual=False`` explicitly — released checkpoints are detected
    from ``WhisperConfig.multilingual``). ``multilingual=None`` falls back
    to vocab membership (toy/custom vocabs). An unknown ``language`` on a
    multilingual model raises rather than silently degrading the prompt.
    """
    if multilingual is None:
        try:
            decoder.token_id("<|en|>")
            multilingual = True
        except KeyError:
            multilingual = False
    toks = [decoder_start_token]
    if multilingual:
        try:
            toks.append(decoder.token_id(f"<|{language}|>"))
        except KeyError:
            raise ValueError(
                f"language {language!r} has no <|{language}|> token in this "
                "Whisper vocabulary — pass a supported two-letter code"
            ) from None
        toks.append(decoder.token_id(f"<|{task}|>"))
    try:
        toks.append(decoder.token_id("<|notimestamps|>"))
    except KeyError:
        pass  # toy vocab without timestamp machinery
    return toks


def make_dwer_jax_metric(
    params_path: str,
    tokenizer_path: str,
    cfg=None,
    language: str = "en",
    max_new_tokens: int = 224,
    batch_size: int = 8,
    decode_dtype=None,
) -> MetricStats:
    """On-device dWER from a converted Whisper ``.npz`` + its tokenizer dir.

    Transcribes hypothesis and reference signals with the first-party JAX
    Whisper (30 s pad/trim, single window — the reference's dWER operates
    on utterance-length eval clips) and scores WER between the two
    transcripts, lowercased/stripped like the reference
    (``downstream/metrics/dwer.py:100-109``).

    ``decode_dtype=jnp.bfloat16`` opts into the ~1.5× faster HBM-lean
    greedy scan (see :func:`audiocodecs_tpu.nn.whisper.whisper_generate`);
    transcripts may differ on near-tied tokens — measure before trusting.
    """
    from audiocodecs_tpu.nn.whisper import (
        WhisperConfig,
        log_mel_spectrogram,
        whisper_generate,
    )
    from audiocodecs_tpu.utils.checkpoint import load_params

    if cfg is None:
        cfg_json = os.path.join(tokenizer_path, "config.json")
        if not os.path.exists(cfg_json):
            raise ValueError(
                f"no config.json in {tokenizer_path!r} — pass cfg= or copy "
                "the HF config next to vocab.json (guessing the architecture "
                "would fail later with opaque shape errors)")
        with open(cfg_json, encoding="utf-8") as f:
            cfg = WhisperConfig.from_hf_dict(json.load(f))
    params = jax.device_put(load_params(params_path))
    decoder = ByteLevelDecoder.from_dir(tokenizer_path)
    # released checkpoints: .en models (vocab 51864) must not get
    # language/task tokens even though their tokenizers contain them;
    # toy/custom vocabs fall back to vocab membership
    multilingual = (cfg.multilingual
                    if cfg.vocab_size in (51864, 51865) else None)
    forced = tuple(whisper_forced_tokens(decoder, cfg.decoder_start_token,
                                         language, multilingual=multilingual))

    @jax.jit
    def _transcribe_batch(p, wav):
        mel = log_mel_spectrogram(wav, cfg.num_mel_bins)
        return whisper_generate(p, cfg, mel, list(forced),
                                max_new_tokens=max_new_tokens,
                                decode_dtype=decode_dtype)

    # reference normalization before scoring (dwer.py:96 goes through the
    # Whisper tokenizer's normalizer) — first-party here
    if language == "en":
        from audiocodecs_tpu.downstream.metrics.text_norm import (
            EnglishTextNormalizer,
        )

        normalize = EnglishTextNormalizer()
    else:
        from audiocodecs_tpu.downstream.metrics.text_norm import (
            BasicTextNormalizer,
        )

        normalize = BasicTextNormalizer()

    # transcript memoization: dWER + dCER on the same eval signals (and
    # hyp==ref control rows) transcribe once, not per-metric
    cache: dict[tuple, str] = {}

    def transcribe(sigs, sample_rate: int) -> list[str]:
        import hashlib

        if sample_rate is None:
            raise ValueError("pass sample_rate= (Hz) to transcribe signals")
        if sample_rate != _WHISPER_SR:
            from audiocodecs_tpu.resample import resample

            sigs = [np.asarray(resample(jnp.asarray(
                np.asarray(s, np.float32))[None], sample_rate,
                _WHISPER_SR))[0] for s in sigs]
        keys = [hashlib.sha1(np.asarray(s, np.float32).tobytes()).digest()
                for s in sigs]
        todo = [(k, s) for k, s in zip(keys, sigs) if k not in cache]
        for start in range(0, len(todo), batch_size):
            group = todo[start:start + batch_size]
            # pad the batch dim UP to the next power-of-two bucket (≤
            # batch_size): recipe batteries score one utterance per call,
            # and always padding to batch_size would run the expensive
            # greedy-decode scan on ~7 dummy rows per real one. Buckets
            # bound compiles to log2(batch_size)+1 shapes.
            bucket = 1
            while bucket < len(group):
                bucket *= 2
            wav = np.zeros((min(bucket, batch_size), _CHUNK), np.float32)
            for b, (_, s) in enumerate(group):
                s = np.asarray(s, np.float32)[:_CHUNK]
                wav[b, : s.size] = s
            toks, lengths = _transcribe_batch(params, jnp.asarray(wav))
            toks, lengths = np.asarray(toks), np.asarray(lengths)
            for b, (k, _) in enumerate(group):
                cache[k] = decoder.decode(toks[b, : lengths[b]])
        out = [cache[k] for k in keys]
        if len(cache) > 8192:  # bound eval-set memory
            # evict AFTER collecting results — clearing first would throw
            # away the transcripts just computed and re-run the batch
            cache.clear()
            cache.update(zip(keys, out))
        return out

    def _texts(hyp_sigs, ref_sigs, sample_rate):
        hyp = [normalize(t) for t in transcribe(hyp_sigs, sample_rate)]
        ref = [normalize(t) for t in transcribe(ref_sigs, sample_rate)]
        return hyp, ref

    def metric(hyp_sigs, ref_sigs, sample_rate: int):
        hyp, ref = _texts(hyp_sigs, ref_sigs, sample_rate)
        return [word_error_rate([h], [r]) for h, r in zip(hyp, ref)]

    def cer(hyp_sigs, ref_sigs, sample_rate: int):
        hyp, ref = _texts(hyp_sigs, ref_sigs, sample_rate)
        return [char_error_rate([h], [r]) for h, r in zip(hyp, ref)]

    stats = MetricStats(metric, name="dWER")
    stats.transcribe = transcribe
    stats.cer = cer
    stats.normalize = normalize
    return stats
