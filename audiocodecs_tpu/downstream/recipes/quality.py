"""Shared gated quality-metric construction for recipe eval batteries.

The reference instantiates the same metric "computers" in several recipes:
``test_sr.py:102-143`` (UTMOS/DNSMOS/dWER/SpkSim + DSP battery),
``train_slm.py:265-296`` (UTMOS/DNSMOS/ASR-PPL/SpkSim over generated
continuations), ``train_tts.py:266-281`` (UTMOS/DNSMOS/dWER/SpkSim over
generated speech). This module centralizes the config-gated construction so
every recipe resolves the same config keys to the same backends:

  * ``utmos_checkpoint`` (first-party JAX) / ``utmos_model_path`` (torch)
  * ``dnsmos_params`` (first-party JAX; defaults to the shipped params)
  * ``whisper_checkpoint`` + ``whisper_tokenizer`` (first-party JAX) /
    ``whisper_path`` (torch) → dWER (and transcription for ASR-PPL)
  * ``speaker_encoder_checkpoint`` (+``speaker_encoder_config``, JAX) /
    ``speaker_encoder_model_path`` (torch) → SpkSim
  * ``lm_checkpoint`` + ``lm_tokenizer`` (first-party JAX GPT-2) /
    ``lm_path`` (torch) → ASR perplexity

Every metric is optional: a missing gate simply omits the metric, matching
the reference's ``compute_metrics`` switches rather than failing the run.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["build_quality_metrics", "trim_row",
           "reconcile_length", "PairBattery"]


def trim_row(sig_row: np.ndarray, rel_len: float) -> np.ndarray:
    """Cut one padded signal row to its valid length (relative)."""
    n = int(round(float(rel_len) * sig_row.shape[-1]))
    return sig_row[: max(n, 1)]


def reconcile_length(rec: np.ndarray, T: int) -> np.ndarray:
    """Replicate-pad / trim ``[B, T']`` to the reference length ``T``
    (reference test_sr.py:90-100; shared by the SR/SLM/TTS recipes)."""
    if rec.shape[1] < T:
        pad = T - rec.shape[1]
        rec = np.concatenate([rec, np.repeat(rec[:, -1:], pad, axis=1)],
                             axis=1)
    return rec[:, :T]


def build_quality_metrics(cfg: dict, sample_rate: int,
                          want: tuple = ("utmos", "dnsmos", "dwer", "spk",
                                         "ppl")) -> dict:
    """Resolve config gates to metric callables.

    Returns a dict with:
      * ``single``: ``{name: fn(sig_1d) -> float}`` — UTMOS / DNSMOS rows.
      * ``dwer``: MetricStats-like with ``.metric([hyp],[ref],sr)`` (and
        optionally ``.cer``) or None.
      * ``spk``: MetricStats-like with ``.metric(hyp[None],ref[None],sr)``
        or None.
      * ``ppl``: MetricStats-like with ``.metric([sig]|[text],sr)`` or None.
    """
    out: dict = {"single": {}, "dwer": None, "spk": None, "ppl": None}

    if "dnsmos" in want:
        dnsmos_params = cfg.get("dnsmos_params")
        if dnsmos_params is None:
            from audiocodecs_tpu.downstream.metrics.dnsmos import (
                DEFAULT_PARAMS_PATH,
            )
            dnsmos_params = (DEFAULT_PARAMS_PATH
                             if os.path.exists(DEFAULT_PARAMS_PATH) else "")
        if dnsmos_params:
            from audiocodecs_tpu.downstream.metrics.dnsmos import dnsmos_p808

            out["single"]["DNSMOS"] = (
                lambda s: dnsmos_p808(s, sample_rate, dnsmos_params))

    if "utmos" in want:
        if cfg.get("utmos_checkpoint"):  # first-party JAX path (on-device)
            from audiocodecs_tpu.downstream.metrics.utmos import (
                make_utmos_jax_metric,
            )
            utmos = make_utmos_jax_metric(
                cfg["utmos_checkpoint"],
                bucket_seconds=float(cfg.get("utmos_bucket_seconds", 0.0)))
            out["single"]["UTMOS"] = (
                lambda s: float(utmos.metric([s], sample_rate)[0]))
        elif cfg.get("utmos_model_path"):  # gated torch path
            from audiocodecs_tpu.downstream.metrics.external import (
                make_utmos_metric,
            )
            utmos = make_utmos_metric(cfg["utmos_model_path"])
            out["single"]["UTMOS"] = (
                lambda s: float(utmos.metric([s], sample_rate)[0]))

    if "dwer" in want and (cfg.get("whisper_checkpoint")
                           or cfg.get("whisper_path")):
        from audiocodecs_tpu.downstream.metrics.external import (
            make_dwer_metric,
        )
        out["dwer"] = make_dwer_metric(
            cfg.get("whisper_path"),
            cfg.get("dwer_language", "en"),
            checkpoint=cfg.get("whisper_checkpoint"),
            tokenizer_path=cfg.get("whisper_tokenizer"),
        )

    if "spk" in want and (cfg.get("speaker_encoder_checkpoint")
                          or cfg.get("speaker_encoder_model_path")):
        from audiocodecs_tpu.downstream.metrics.external import (
            make_speaker_similarity_metric,
        )
        out["spk"] = make_speaker_similarity_metric(
            model_path=cfg.get("speaker_encoder_model_path"),
            checkpoint=cfg.get("speaker_encoder_checkpoint"),
            config=cfg.get("speaker_encoder_config"),
        )

    # PPL needs BOTH an LM and a transcription backend — recipes score
    # signals, and the LM alone would raise mid-eval on the first signal
    if ("ppl" in want
            and (cfg.get("lm_checkpoint") or cfg.get("lm_path"))
            and (cfg.get("whisper_checkpoint") or cfg.get("whisper_path"))):
        from audiocodecs_tpu.downstream.metrics.external import (
            make_perplexity_metric,
        )
        out["ppl"] = make_perplexity_metric(
            lm_path=cfg.get("lm_path"),
            whisper_path=cfg.get("whisper_path"),
            checkpoint=cfg.get("lm_checkpoint"),
            tokenizer_path=cfg.get("lm_tokenizer"),
            whisper_checkpoint=cfg.get("whisper_checkpoint"),
            whisper_tokenizer=cfg.get("whisper_tokenizer"),
        )

    return out


class PairBattery:
    """Per-utterance (hyp, ref) quality battery with mean summarization.

    The reference's SE/SS/TTS recipes all score generated/enhanced speech
    against a reference signal with the same metric set
    (UTMOS/DNSMOS/STOI/PESQ/MelD/STFTD/dWER/SpkSim — e.g. reference
    ``train_se.py:153-161``); this accumulates that battery. DSP metrics
    (STOI/PESQ/MelD/STFTD) are first-party and always on; the rest follow
    the config gates of :func:`build_quality_metrics`. Control-row
    variants are scored by passing ``prefix="Rec"`` / ``"Ref"``.
    """

    def __init__(self, cfg: dict, sample_rate: int,
                 want: tuple = ("utmos", "dnsmos", "dwer", "spk"),
                 dsp: bool = True):
        self.sample_rate = sample_rate
        self.quality = build_quality_metrics(cfg, sample_rate, want)
        self.dsp = dsp
        self.scores: dict[str, list] = {}
        self.ids: dict[str, list] = {}
        self._uid = None

    def add(self, name: str, val: float):
        self.scores.setdefault(name, []).append(float(val))
        self.ids.setdefault(name, []).append(self._uid)

    def score_pair(self, hyp: np.ndarray, ref: np.ndarray,
                   prefix: str = "", uid: str | None = None):
        """One trimmed hypothesis row vs its trimmed reference row."""
        self._uid = uid
        T = min(hyp.shape[-1], ref.shape[-1])
        hyp, ref = np.asarray(hyp)[:T], np.asarray(ref)[:T]
        for name, fn in self.quality["single"].items():
            self.add(prefix + name, fn(hyp))
        if self.dsp:
            import jax.numpy as jnp

            from audiocodecs_tpu.downstream.metrics.dsp import (
                mel_distance,
                stft_distance,
            )
            from audiocodecs_tpu.downstream.metrics.pesq import pesq
            from audiocodecs_tpu.downstream.metrics.stoi import stoi

            self.add(prefix + "STOI", stoi(hyp, ref, self.sample_rate))
            self.add(prefix + "PESQ", pesq(hyp, ref, self.sample_rate))
            self.add(prefix + "MelD", np.asarray(mel_distance(
                jnp.asarray(hyp)[None], jnp.asarray(ref)[None],
                self.sample_rate))[0])
            self.add(prefix + "STFTD", np.asarray(stft_distance(
                jnp.asarray(hyp)[None], jnp.asarray(ref)[None]))[0])
        if self.quality["dwer"] is not None:
            dwer = self.quality["dwer"]
            self.add(prefix + "dWER",
                     dwer.metric([hyp], [ref], self.sample_rate)[0])
            if hasattr(dwer, "cer"):
                self.add(prefix + "dCER",
                         dwer.cer([hyp], [ref], self.sample_rate)[0])
        if self.quality["spk"] is not None:
            self.add(prefix + "SpkSim", self.quality["spk"].metric(
                hyp[None], ref[None], self.sample_rate)[0])

    def score_single(self, sig: np.ndarray, prefix: str = "",
                     uid: str | None = None):
        """Single-signal rows only (UTMOS/DNSMOS) — the Ref control rows."""
        self._uid = uid
        for name, fn in self.quality["single"].items():
            self.add(prefix + name, fn(np.asarray(sig)))

    def summary(self) -> dict:
        # Finite-filtered mean, same policy as MetricStats.summarize
        # (metrics/base.py): one degenerate utterance (e.g. a PESQ nan on
        # pathological input) must not poison the battery average.
        def _mean(vals):
            arr = np.asarray(vals, dtype=np.float64)
            arr = arr[np.isfinite(arr)]
            return float(arr.mean()) if arr.size else float("nan")

        return {name: _mean(vals) for name, vals in self.scores.items()}

    def write_stats(self, out_dir: str):
        """Per-utterance metric files like the reference's MetricStats dumps
        (one ``<metric>.txt`` per metric: ``uid value`` lines + the mean)."""
        os.makedirs(out_dir, exist_ok=True)
        for name, vals in self.scores.items():
            with open(os.path.join(out_dir, f"{name.lower()}.txt"),
                      "w") as f:
                for uid, v in zip(self.ids[name], vals):
                    f.write(f"{uid if uid is not None else '-'}\t{v:.6f}\n")
                if vals:
                    arr = np.asarray(vals, dtype=np.float64)
                    arr = arr[np.isfinite(arr)]
                    m = float(arr.mean()) if arr.size else float("nan")
                    f.write(f"# mean\t{m:.6f}\n")
