"""Synthetic test corpus generator.

Generates a small deterministic speech-like corpus (wavs + transcripts +
class labels + noisy/clean pairs + 2-speaker mixtures) so every recipe runs
end-to-end offline — the role the reference's real-dataset preps play, with
the same manifest contract.
"""

from __future__ import annotations

import os

import numpy as np

from audiocodecs_tpu.downstream.datasets.manifest import write_manifest
from audiocodecs_tpu.utils.audio import write_wav

__all__ = ["prepare_synthetic"]

_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
          "hotel", "india", "juliett"]


def _speech_like(rng, sample_rate: int, seconds: float,
                 f0: float) -> np.ndarray:
    t = np.arange(int(sample_rate * seconds)) / sample_rate
    phase = 2 * np.pi * f0 * t * (1 + 0.02 * np.sin(2 * np.pi * 2.5 * t))
    sig = sum(
        a * np.sin(k * phase) for k, a in ((1, 0.5), (2, 0.25), (3, 0.12))
    )
    env = 0.5 * (1 + np.sin(2 * np.pi * rng.uniform(2, 5) * t))
    noise = rng.standard_normal(len(t)) * 0.02
    return (sig * env + noise).astype(np.float32) * 0.5


def prepare_synthetic(
    out_dir: str,
    sample_rate: int = 16000,
    num_utts: int = 12,
    num_speakers: int = 4,
    num_classes: int = 3,
    min_seconds: float = 0.5,
    max_seconds: float = 2.0,
    seed: int = 0,
) -> dict[str, str]:
    """Create wavs + manifests; returns {split: manifest_path}.

    Columns: ID, duration, wav, wrd (transcript), utt_label (class),
    spk_id, noisy_wav (for SE), mix_wav/src2_wav (for SS).
    """
    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(out_dir, "wav")
    os.makedirs(wav_dir, exist_ok=True)
    rows = []
    f0s = rng.uniform(90, 260, size=num_speakers)
    for i in range(num_utts):
        spk = i % num_speakers
        seconds = float(rng.uniform(min_seconds, max_seconds))
        sig = _speech_like(rng, sample_rate, seconds, f0s[spk])
        wav = os.path.join(wav_dir, f"utt{i:04d}.wav")
        write_wav(wav, sig, sample_rate)
        # noisy version (SE)
        noisy = sig + rng.standard_normal(len(sig)).astype(np.float32) * 0.05
        noisy_wav = os.path.join(wav_dir, f"utt{i:04d}_noisy.wav")
        write_wav(noisy_wav, noisy, sample_rate)
        # 2-speaker mixture (SS)
        other = _speech_like(rng, sample_rate, seconds, f0s[(spk + 1) % num_speakers])
        mix = (sig + other[: len(sig)]) * 0.5
        mix_wav = os.path.join(wav_dir, f"utt{i:04d}_mix.wav")
        src2_wav = os.path.join(wav_dir, f"utt{i:04d}_src2.wav")
        write_wav(mix_wav, mix, sample_rate)
        write_wav(src2_wav, other, sample_rate)
        n_words = int(rng.integers(2, 6))
        wrd = " ".join(rng.choice(_WORDS, n_words))
        rows.append(
            {
                "ID": f"utt{i:04d}",
                "duration": round(len(sig) / sample_rate, 4),
                "wav": wav,
                "wrd": wrd,
                "utt_label": f"class{i % num_classes}",
                "spk_id": f"spk{spk}",
                "noisy_wav": noisy_wav,
                "mix_wav": mix_wav,
                "src2_wav": src2_wav,
            }
        )
    n = len(rows)
    splits = {
        # boundaries clamped so every split is non-empty down to n=3
        # (write_manifest rejects empty manifests)
        "train": rows[: max(1, min(int(n * 0.6), n - 2))],
        "valid": rows[max(1, min(int(n * 0.6), n - 2))
                      : max(2, min(int(n * 0.8), n - 1))],
        "test": rows[max(2, min(int(n * 0.8), n - 1)) :],
    }
    out = {}
    for split, split_rows in splits.items():
        path = os.path.join(out_dir, f"{split}.csv")
        write_manifest(path, split_rows)
        out[split] = path
    return out
