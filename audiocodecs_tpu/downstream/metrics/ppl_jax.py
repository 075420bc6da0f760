"""First-party on-device ASR perplexity: byte-BPE encode + JAX GPT-2.

The reference transcribes with Whisper and scores the text with a
downloaded HF causal LM (reference ``downstream/metrics/perplexity.py:
33-156``). This is the first-party TPU path: text is encoded with the
checkpoint's own byte-level BPE (:mod:`audiocodecs_tpu.utils.bytebpe`) and
scored by the converted GPT-2 (:mod:`audiocodecs_tpu.nn.gpt2`) fully
on-device — no torch, no ``transformers`` at metric time. Signals are
transcribed through the first-party Whisper dWER backend when one is
provided.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.metrics.base import MetricStats

__all__ = ["make_perplexity_jax_metric"]


def _bucket(n: int, cap: int) -> int:
    """Next power-of-two length ≥ n (≥16, ≤cap) — bounds jit recompiles."""
    b = 16
    while b < n and b < cap:
        b *= 2
    return min(b, cap)


def make_perplexity_jax_metric(
    checkpoint: str,
    tokenizer_path: str | None = None,
    cfg=None,
    whisper_checkpoint: str | None = None,
    whisper_tokenizer: str | None = None,
    batch_size: int = 8,
) -> MetricStats:
    """On-device text perplexity from a converted GPT-2 ``.npz``.

    ``tokenizer_path``: dir with ``vocab.json`` + ``merges.txt``
    (+ optional ``config.json`` for the architecture). The metric accepts
    either texts (scored directly) or signals (transcribed first via the
    first-party Whisper when ``whisper_checkpoint`` is given), mirroring
    the torch wrapper's contract.
    """
    from audiocodecs_tpu.nn.gpt2 import GPT2Config, gpt2_nll
    from audiocodecs_tpu.utils.bytebpe import ByteLevelBPE
    from audiocodecs_tpu.utils.checkpoint import load_params

    tokenizer_path = tokenizer_path or os.path.dirname(checkpoint)
    if cfg is None:
        cfg_json = os.path.join(tokenizer_path, "config.json")
        if not os.path.exists(cfg_json):
            raise ValueError(
                f"no config.json in {tokenizer_path!r} — pass cfg= or copy "
                "the HF config next to vocab.json")
        with open(cfg_json, encoding="utf-8") as f:
            cfg = GPT2Config.from_hf_dict(json.load(f))
    params = jax.device_put(load_params(checkpoint))
    bpe = ByteLevelBPE.from_dir(tokenizer_path)

    nll_fn = jax.jit(lambda p, t, n: gpt2_nll(p, t, n, cfg))

    def text_ppl(texts: list[str]) -> list[float]:
        out = [float("nan")] * len(texts)
        by_bucket: dict[int, list[tuple[int, list[int]]]] = {}
        for idx, t in enumerate(texts):
            ids = bpe.encode(t)[: cfg.n_positions]
            if len(ids) < 2:
                continue  # nan, like the reference's torch path
            by_bucket.setdefault(_bucket(len(ids), cfg.n_positions),
                                 []).append((idx, ids))
        for L, group in by_bucket.items():
            # fixed [batch_size, L] tiles: one compile per bucket length,
            # bounded logits materialization ([B, L, V] scales with B)
            for start in range(0, len(group), batch_size):
                chunk = group[start:start + batch_size]
                toks = np.zeros((batch_size, L), np.int32)
                lens = np.zeros((batch_size,), np.int32)
                for b, (_, ids) in enumerate(chunk):
                    toks[b, : len(ids)] = ids
                    lens[b] = len(ids)
                lens[len(chunk):] = 2  # dummy rows: cheap, discarded
                nll = np.asarray(nll_fn(params, jnp.asarray(toks),
                                        jnp.asarray(lens)))
                for b, (idx, _) in enumerate(chunk):
                    out[idx] = float(math.exp(nll[b]))
        return out

    transcribe = None
    if whisper_checkpoint is not None:
        from audiocodecs_tpu.downstream.metrics.dwer_jax import (
            make_dwer_jax_metric,
        )

        transcribe = make_dwer_jax_metric(
            whisper_checkpoint,
            whisper_tokenizer or os.path.dirname(whisper_checkpoint),
        ).transcribe

    def metric(sigs_or_texts, sample_rate: int | None = None):
        if len(sigs_or_texts) == 0:
            return []
        if isinstance(sigs_or_texts[0], str):
            return text_ppl(sigs_or_texts)
        if transcribe is None:
            raise RuntimeError("pass whisper_checkpoint= to score signals "
                               "(perplexity of the Whisper transcript)")
        if sample_rate is None:
            raise ValueError("pass sample_rate= (Hz) to score signals")
        return text_ppl(transcribe(sigs_or_texts, sample_rate))

    stats = MetricStats(metric, name="ASR-PPL")
    stats.text_ppl = text_ppl
    return stats
