"""Metrics backed by external pretrained models (gated).

The reference computes UTMOS / DNSMOS / dWER / speaker-similarity / ASR-PPL
through downloaded pretrained models (reference ``metrics/utmos.py``,
``dnsmos.py``, ``dwer.py``, ``speaker_similarity.py``, ``perplexity.py``).
These run host-side (they are evaluation tools, not the TPU hot path) and
require model weights that must be available locally — each factory raises a
clear error naming what to provide when the weights/deps are missing.
"""

from __future__ import annotations

import os

import numpy as np

from audiocodecs_tpu.downstream.metrics.base import MetricStats

__all__ = [
    "make_dwer_metric",
    "make_speaker_similarity_metric",
    "make_perplexity_metric",
    "make_utmos_metric",
    "make_dnsmos_metric",
    "word_error_rate",
    "char_error_rate",
]


def _edit_distance(r: list, h: list) -> int:
    d = np.zeros((len(r) + 1, len(h) + 1), np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            sub = d[i - 1, j - 1] + (r[i - 1] != h[j - 1])
            d[i, j] = min(sub, d[i - 1, j] + 1, d[i, j - 1] + 1)
    return int(d[len(r), len(h)])


def word_error_rate(hyps: list[str], refs: list[str]) -> float:
    """Corpus WER via Levenshtein over words (used by dWER and ASR eval)."""
    errs = tot = 0
    for hyp, ref in zip(hyps, refs):
        h, r = hyp.split(), ref.split()
        errs += _edit_distance(r, h)
        tot += len(r)
    return errs / max(tot, 1)


def char_error_rate(hyps: list[str], refs: list[str]) -> float:
    """Corpus CER: Levenshtein over characters with a ``_`` boundary token
    between words, like the reference's ``ErrorRateStats(split_tokens=True)``
    (speechbrain ``split_word`` joins words with ``_`` before splitting to
    chars; dWER's CER field, reference ``metrics/dwer.py:50,103``)."""
    errs = tot = 0
    for hyp, ref in zip(hyps, refs):
        h = list("_".join(hyp.split()))
        r = list("_".join(ref.split()))
        errs += _edit_distance(r, h)
        tot += len(r)
    return errs / max(tot, 1)


def _require(condition: bool, what: str, how: str):
    if not condition:
        raise RuntimeError(
            f"{what} is unavailable in this environment. {how} "
            "(This metric wraps an external pretrained model, matching the "
            "reference's behavior of downloading it at first use; this "
            "environment has no network egress.)"
        )


def make_dwer_metric(whisper_path: str | None = None,
                     language: str = "en",
                     checkpoint: str | None = None,
                     tokenizer_path: str | None = None) -> MetricStats:
    """Differential WER: transcribe hyp & ref with Whisper, WER between them
    (reference ``metrics/dwer.py:33-115``).

    Two backends:
      * ``checkpoint`` + ``tokenizer_path``: converted Whisper ``.npz`` —
        the first-party JAX path, transcription runs on-device
        (:func:`audiocodecs_tpu.downstream.metrics.dwer_jax.make_dwer_jax_metric`).
      * ``whisper_path``: local torch checkpoint dir (the reference's
        host-side path).
    """
    import importlib.util

    if checkpoint is not None:
        from audiocodecs_tpu.downstream.metrics.dwer_jax import (
            make_dwer_jax_metric,
        )

        return make_dwer_jax_metric(checkpoint, tokenizer_path or
                                    os.path.dirname(checkpoint),
                                    language=language)
    _require(
        whisper_path is not None,
        "dWER (Whisper transcription)",
        "Pass checkpoint= (converted Whisper .npz, first-party JAX path) or "
        "whisper_path pointing at a local Whisper checkpoint directory "
        "(transformers format).",
    )
    _require(
        importlib.util.find_spec("transformers") is not None,
        "transformers", "Install transformers.",
    )
    import torch
    from transformers import WhisperForConditionalGeneration, WhisperProcessor

    processor = WhisperProcessor.from_pretrained(whisper_path)
    model = WhisperForConditionalGeneration.from_pretrained(whisper_path).eval()

    def transcribe(sigs: np.ndarray, sample_rate: int) -> list[str]:
        feats = processor(
            [np.asarray(s, dtype=np.float32) for s in sigs],
            sampling_rate=sample_rate, return_tensors="pt",
        ).input_features
        with torch.no_grad():
            ids = model.generate(feats, language=language, task="transcribe")
        return processor.batch_decode(ids, skip_special_tokens=True)

    from audiocodecs_tpu.downstream.metrics.text_norm import (
        BasicTextNormalizer,
        EnglishTextNormalizer,
    )

    normalize = (EnglishTextNormalizer() if language == "en"
                 else BasicTextNormalizer())

    def metric(hyp_sigs, ref_sigs, sample_rate: int):
        hyp_texts = transcribe(hyp_sigs, sample_rate)
        ref_texts = transcribe(ref_sigs, sample_rate)
        return [
            word_error_rate([normalize(h)], [normalize(r)])
            for h, r in zip(hyp_texts, ref_texts)
        ]

    stats = MetricStats(metric, name="dWER")
    stats.transcribe = transcribe
    stats.normalize = normalize
    return stats


def make_speaker_similarity_metric(model_path: str | None = None,
                                   checkpoint: str | None = None,
                                   config: dict | None = None) -> MetricStats:
    """Cosine similarity of x-vector speaker embeddings
    (reference ``metrics/speaker_similarity.py:34-123``).

    Two backends:
      * ``checkpoint``: converted ``wavlm_xvector`` .npz — runs the
        first-party JAX encoder (``downstream/models/speaker_encoder.py``)
        on-device; ``config`` holds XVectorConfig overrides.
      * ``model_path``: local torch ``AutoModelForAudioXVector`` checkpoint
        (the reference's host-side path).
    """
    if checkpoint is not None:
        return _speaker_similarity_jax(checkpoint, config)
    _require(
        model_path is not None,
        "Speaker similarity (WavLM x-vector)",
        "Pass checkpoint= (converted wavlm_xvector .npz, first-party JAX "
        "path) or model_path= (local torch AutoModelForAudioXVector "
        "checkpoint, e.g. microsoft/wavlm-base-sv).",
    )
    import torch
    from transformers import AutoFeatureExtractor, AutoModelForAudioXVector

    extractor = AutoFeatureExtractor.from_pretrained(model_path)
    model = AutoModelForAudioXVector.from_pretrained(model_path).eval()

    def embed(sigs, sample_rate):
        inputs = extractor(
            [np.asarray(s, dtype=np.float32) for s in sigs],
            sampling_rate=sample_rate, return_tensors="pt", padding=True,
        )
        with torch.no_grad():
            return model(**inputs).embeddings

    def metric(hyp_sigs, ref_sigs, sample_rate: int):
        he = embed(hyp_sigs, sample_rate)
        re = embed(ref_sigs, sample_rate)
        import torch.nn.functional as F

        return F.cosine_similarity(he, re, dim=-1).numpy()

    stats = MetricStats(metric, name="SpkSim")
    stats.embed = embed
    return stats


def _speaker_similarity_jax(checkpoint: str, config: dict | None) -> MetricStats:
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.models.speaker_encoder import load_xvector

    _, _, embed_fn = load_xvector(checkpoint, config)

    def embed(sigs, sample_rate):
        del sample_rate  # caller resamples; WavLM x-vector is 16 kHz-trained
        # per-utterance (variable lengths; stats pooling must not see padding)
        return np.stack([
            np.asarray(embed_fn(jnp.asarray(
                np.asarray(s, np.float32)[None]))[0])
            for s in sigs
        ])

    def metric(hyp_sigs, ref_sigs, sample_rate: int):
        he = embed(hyp_sigs, sample_rate)
        re_ = embed(ref_sigs, sample_rate)
        num = np.sum(he * re_, axis=-1)
        den = np.linalg.norm(he, axis=-1) * np.linalg.norm(re_, axis=-1)
        return num / np.maximum(den, 1e-12)

    stats = MetricStats(metric, name="SpkSim")
    stats.embed = embed
    return stats


def make_perplexity_metric(lm_path: str | None = None,
                           whisper_path: str | None = None,
                           checkpoint: str | None = None,
                           tokenizer_path: str | None = None,
                           whisper_checkpoint: str | None = None,
                           whisper_tokenizer: str | None = None) -> MetricStats:
    """Token-weighted LM perplexity of (whisper-transcribed) text
    (reference ``metrics/perplexity.py:33-156``).

    Two backends:
      * ``checkpoint`` (+ ``tokenizer_path``): converted GPT-2 ``.npz`` —
        the first-party JAX path, encoding + LM scoring run on-device
        (:func:`audiocodecs_tpu.downstream.metrics.ppl_jax.make_perplexity_jax_metric`);
        ``whisper_checkpoint`` adds first-party signal transcription.
      * ``lm_path``: local torch causal-LM checkpoint dir (the
        reference's host-side path).
    """
    if checkpoint is not None:
        from audiocodecs_tpu.downstream.metrics.ppl_jax import (
            make_perplexity_jax_metric,
        )

        return make_perplexity_jax_metric(
            checkpoint, tokenizer_path,
            whisper_checkpoint=whisper_checkpoint,
            whisper_tokenizer=whisper_tokenizer)
    _require(
        lm_path is not None,
        "ASR perplexity (causal LM)",
        "Pass checkpoint= (converted GPT-2 .npz, first-party JAX path) or "
        "lm_path pointing at a local causal LM checkpoint "
        "(e.g. gpt2-large).",
    )
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    tok = AutoTokenizer.from_pretrained(lm_path)
    lm = AutoModelForCausalLM.from_pretrained(lm_path).eval()
    dwer = make_dwer_metric(whisper_path) if whisper_path else None

    def text_ppl(texts: list[str]):
        out = []
        for t in texts:
            ids = tok(t, return_tensors="pt").input_ids
            if ids.shape[-1] < 2:
                out.append(float("nan"))
                continue
            with torch.no_grad():
                loss = lm(ids, labels=ids).loss
            out.append(float(torch.exp(loss)))
        return out

    def metric(sigs_or_texts, sample_rate: int | None = None):
        if not len(sigs_or_texts):
            return []
        if isinstance(sigs_or_texts[0], str):
            return text_ppl(sigs_or_texts)
        _require(dwer is not None, "Whisper for PPL transcription",
                 "Pass whisper_path.")
        return text_ppl(dwer.transcribe(sigs_or_texts, sample_rate))

    stats = MetricStats(metric, name="ASR-PPL")
    return stats


def make_utmos_metric(model_path: str | None = None) -> MetricStats:
    """UTMOS predicted MOS (reference ``metrics/utmos.py:30-54``).

    The reference pulls ``tarepan/SpeechMOS`` via torch.hub; provide the
    scripted model file locally. For the on-device first-party JAX path
    (converted checkpoint → TPU forward, like DNSMOS), use
    :func:`audiocodecs_tpu.downstream.metrics.utmos.make_utmos_jax_metric`.
    """
    _require(
        model_path is not None,
        "UTMOS",
        "Pass model_path pointing at a locally-saved utmos22_strong "
        "TorchScript module.",
    )
    import torch

    predictor = torch.jit.load(model_path).eval()

    def metric(sigs, sample_rate: int):
        out = []
        for s in sigs:
            with torch.no_grad():
                out.append(
                    float(predictor(torch.as_tensor(np.asarray(s))[None],
                                    sample_rate))
                )
        return out

    return MetricStats(metric, name="UTMOS")


def make_dnsmos_metric(onnx_path: str | None = None) -> MetricStats:
    """DNSMOS P.808 (reference ``metrics/dnsmos.py:45-152`` wraps onnxruntime
    on 9.01 s windows)."""
    import importlib.util

    _require(
        onnx_path is not None and importlib.util.find_spec("onnxruntime") is not None,
        "DNSMOS (onnxruntime + model_v8.onnx)",
        "Install onnxruntime and pass onnx_path to the DNSMOS model.",
    )
    import onnxruntime as ort

    sess = ort.InferenceSession(onnx_path)

    INPUT_LENGTH = 9.01

    def metric(sigs, sample_rate: int):
        out = []
        for s in sigs:
            s = np.asarray(s, dtype=np.float32)
            need = int(INPUT_LENGTH * sample_rate)
            reps = int(np.ceil(need / max(len(s), 1)))
            s = np.tile(s, reps)[:need]
            mos = sess.run(None, {sess.get_inputs()[0].name: s[None]})[0]
            out.append(float(np.asarray(mos).reshape(-1)[0]))
        return out

    return MetricStats(metric, name="DNSMOS")
