"""Synthetic-corpus guarantees: task learnability + prep fingerprinting.

The corpus exists to make the offline recipes *learnable* (the reference
validates on real speech; our stand-in must keep word identity acoustically
present and speaker identity in the pitch). These tests pin those
properties cheaply so a generator tweak can't silently break the quality
loop, and pin the fingerprint mechanism that prevents stale-corpus reuse
(same knobs, older generator => different audio).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

from audiocodecs_tpu.downstream.datasets import synthetic
from audiocodecs_tpu.downstream.datasets.synthetic import (
    _WORDS,
    _render_words,
    prepare_synthetic,
)


def _mel_stats(sig: np.ndarray, sr: int = 16000, n_fft: int = 512,
               n_mels: int = 40) -> np.ndarray:
    """Log-mel mean+std over time — the cheap probe feature."""
    hop = n_fft // 2
    n = max(1, (len(sig) - n_fft) // hop + 1)
    frames = np.stack([sig[i * hop: i * hop + n_fft] for i in range(n)])
    mag = np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=-1))
    freqs = np.fft.rfftfreq(n_fft, 1 / sr)
    mel_pts = 700 * (np.expm1(np.linspace(
        np.log1p(0 / 700), np.log1p(sr / 2 / 700), n_mels + 2)))
    fb = np.zeros((n_mels, len(freqs)))
    for m in range(n_mels):
        lo, c, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        fb[m] = np.clip(np.minimum((freqs - lo) / max(c - lo, 1e-9),
                                   (hi - freqs) / max(hi - c, 1e-9)), 0, 1)
    mel = np.log(fb @ mag.T + 1e-6)
    return np.concatenate([mel.mean(1), mel.std(1)])


@pytest.mark.quick
def test_word_identity_is_acoustically_separable():
    """A nearest-class-mean probe on log-mel stats must separate the 10
    words far above chance ACROSS SPEAKERS — the property ASR/KS/IC
    learnability rests on (words are formant motifs, speakers are f0)."""
    rng = np.random.default_rng(0)
    f0s = np.linspace(95, 255, 6)  # span the generator's speaker range
    feats, labels, spk = [], [], []
    for wi, word in enumerate(_WORDS):
        for si, f0 in enumerate(f0s):
            sig = _render_words(rng, 16000, [word], float(f0), 0.5)
            feats.append(_mel_stats(sig))
            labels.append(wi)
            spk.append(si)
    feats = np.stack(feats)
    labels = np.asarray(labels)
    spk = np.asarray(spk)
    # leave-one-speaker-out nearest-class-mean
    correct = total = 0
    for si in range(len(f0s)):
        tr, te = spk != si, spk == si
        mu = np.stack([feats[tr & (labels == wi)].mean(0)
                       for wi in range(len(_WORDS))])
        pred = np.argmin(
            ((feats[te][:, None] - mu[None]) ** 2).sum(-1), axis=1)
        correct += int((pred == labels[te]).sum())
        total += int(te.sum())
    acc = correct / total
    assert acc >= 0.6, (
        f"word probe accuracy {acc:.2f} < 0.6 (chance 0.1) — the corpus "
        "no longer carries speaker-invariant word identity; ASR/KS/IC in "
        "the quality loop will be unlearnable")


@pytest.mark.quick
def test_speaker_identity_is_separable():
    """Same probe on speakers (pitch cue): SI must stay learnable."""
    rng = np.random.default_rng(1)
    f0s = np.linspace(95, 255, 4)
    feats, labels = [], []
    for si, f0 in enumerate(f0s):
        for word in _WORDS[:6]:
            sig = _render_words(rng, 16000, [word], float(f0), 0.5)
            feats.append(_mel_stats(sig))
            labels.append(si)
    feats, labels = np.stack(feats), np.asarray(labels)
    # hold out one word per speaker
    te = np.arange(len(labels)) % 6 == 0
    tr = ~te
    mu = np.stack([feats[tr & (labels == si)].mean(0)
                   for si in range(len(f0s))])
    pred = np.argmin(((feats[te][:, None] - mu[None]) ** 2).sum(-1), axis=1)
    acc = float((pred == labels[te]).mean())
    assert acc >= 0.6, f"speaker probe accuracy {acc:.2f} < 0.6 (chance .25)"


@pytest.mark.quick
def test_derived_ic_ser_labels(tmp_path):
    """v3 columns: ``scenario`` (last-word class, IC) and ``emotion``
    (tempo tercile, SER) must exist, be 3-way non-degenerate, and be
    decorrelated from ``utt_label`` (first-word class, KS) — otherwise
    the IC/SER quality-loop rows would just re-measure KS. Derived labels
    must not change the audio (pinned separately by the fingerprint
    test + the v2==v3 wav byte-comparison done at v3 introduction)."""
    from audiocodecs_tpu.downstream.datasets.manifest import read_manifest

    out = prepare_synthetic(str(tmp_path), num_utts=120, num_speakers=8,
                            num_classes=3, seed=0)
    rows = [r for p in out.values() for r in read_manifest(p)]
    for field, classes in (("scenario", 3), ("emotion", 3)):
        vals = [r[field] for r in rows]
        counts = {v: vals.count(v) for v in set(vals)}
        assert len(counts) == classes, (field, counts)
        assert min(counts.values()) >= len(rows) // 10, (field, counts)
    agree = np.mean([r["utt_label"] == r["scenario"] for r in rows])
    assert agree < 0.7, f"scenario duplicates utt_label ({agree:.2f})"


@pytest.mark.quick
def test_fingerprint_written_and_prep_regenerates_on_mismatch(tmp_path,
                                                              monkeypatch):
    """prepare_data must regenerate when the generator version (or knobs)
    behind an existing prep dir changed — stale manifests alone are not
    enough (advisor r4 medium: old-generator corpora were silently reused)."""
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    prep = str(tmp_path / "corpus")
    cfg = {"dataset": "synthetic", "prep_dir": prep, "sample_rate": 16000,
           "num_utterances": 6, "num_speakers": 2,
           "test_csv": "{prep_dir}/test.csv"}
    prepare_data(cfg)
    fp_path = os.path.join(prep, "_fingerprint.json")
    assert os.path.exists(fp_path)
    fp1 = json.load(open(fp_path))
    assert fp1["generator_version"] == synthetic.GENERATOR_VERSION
    assert fp1["params"]["num_utts"] == 6

    # same knobs, same version -> no regeneration (mtime unchanged)
    wav0 = os.path.join(prep, "wav", "utt0000.wav")
    mtime = os.path.getmtime(wav0)
    prepare_data(cfg)
    assert os.path.getmtime(wav0) == mtime

    # bump the generator version -> full regeneration
    monkeypatch.setattr(synthetic, "GENERATOR_VERSION",
                        synthetic.GENERATOR_VERSION + 1)
    prepare_data(cfg)
    fp2 = json.load(open(fp_path))
    assert fp2["generator_version"] == synthetic.GENERATOR_VERSION
    assert os.path.getmtime(wav0) != mtime

    # changed knob -> regeneration with the new knob in the fingerprint
    cfg2 = dict(cfg, num_utterances=8)
    prepare_data(cfg2)
    fp3 = json.load(open(fp_path))
    assert fp3["params"]["num_utts"] == 8


def test_prepare_synthetic_fingerprint_matches_prepare_data_expectation(
        tmp_path):
    """The defaults prepare_data assumes must equal prepare_synthetic's
    signature defaults, or fingerprint comparison would always mismatch
    and every recipe would re-prep on every run."""
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    prep = str(tmp_path / "c")
    prepare_synthetic(prep, sample_rate=16000, num_utts=6)
    mtime = os.path.getmtime(os.path.join(prep, "test.csv"))
    prepare_data({"dataset": "synthetic", "prep_dir": prep,
                  "sample_rate": 16000, "num_utterances": 6})
    assert os.path.getmtime(os.path.join(prep, "test.csv")) == mtime
