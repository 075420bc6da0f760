"""Kaldi-compatible log-mel fbank (AudioMAE / SemantiCodec front-end).

Reimplements ``torchaudio.compliance.kaldi.fbank`` for the argument set the
SemantiCodec/AudioMAE pipeline uses (reference
``audiocodecs/semanticodec.py:169-176`` calls the vendor's
``extract_kaldi_fbank_feature``, which is torchaudio's kaldi fbank with
``htk_compat=True, use_energy=False, window_type="hanning",
num_mel_bins=128, dither=0.0, frame_shift=10``): snip-edges framing,
DC-offset removal, kaldi preemphasis, symmetric Hann window, power spectrum
zero-padded to the next pow-2 FFT, kaldi (HTK-scale, un-normalized
triangular) mel banks from 20 Hz, natural log with kaldi's epsilon floor.

Parity-tested against torchaudio in ``tests/test_kaldi_fbank.py``.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["kaldi_fbank", "AUDIOMAE_NORM_MEAN", "AUDIOMAE_NORM_STD"]

# AudioSet normalization constants used by AudioMAE/SemantiCodec
AUDIOMAE_NORM_MEAN = -4.2677393
AUDIOMAE_NORM_STD = 4.5689974

EPSILON = 1.1920928955078125e-07  # kaldi's epsilon (float32 eps)


def _mel_hz(mel):
    return 700.0 * (np.exp(mel / 1127.0) - 1.0)


def _hz_mel(hz):
    return 1127.0 * np.log1p(np.asarray(hz, np.float64) / 700.0)


@lru_cache(maxsize=4)
def _banks(sample_rate: int, window_pow2: int, num_bins: int,
           low_freq: float = 20.0, high_freq: float = 0.0) -> np.ndarray:
    """Kaldi mel banks [num_bins, window_pow2 // 2] (nyquist bin dropped,
    matching kaldi's get_mel_banks)."""
    nyquist = 0.5 * sample_rate
    if high_freq <= 0.0:
        high_freq = nyquist + high_freq
    fft_bins = window_pow2 // 2
    fft_bin_width = sample_rate / window_pow2
    mel_lo, mel_hi = _hz_mel(low_freq), _hz_mel(high_freq)
    mel_delta = (mel_hi - mel_lo) / (num_bins + 1)
    bins = np.zeros((num_bins, fft_bins))
    mel_of_bin = _hz_mel(fft_bin_width * np.arange(fft_bins))
    for b in range(num_bins):
        left, center, right = (mel_lo + d * mel_delta
                               for d in (b, b + 1, b + 2))
        up = (mel_of_bin - left) / (center - left)
        down = (right - mel_of_bin) / (right - center)
        bins[b] = np.maximum(0.0, np.minimum(up, down))
    return bins.astype(np.float32)


def kaldi_fbank(sig, sample_rate: int = 16000, num_mel_bins: int = 128,
                frame_length_ms: float = 25.0, frame_shift_ms: float = 10.0,
                preemphasis: float = 0.97, remove_dc_offset: bool = True,
                window: str = "hanning"):
    """``sig`` [B, T] → log-mel [B, F, num_mel_bins] (kaldi semantics).

    ``window``: "hanning" or "povey" (= hann**0.85, kaldi's default; used by
    the SeamlessM4T/w2v-bert front-end). Jittable: all shapes derive
    statically from ``T``.
    """
    sig = jnp.asarray(sig)
    if sig.ndim == 1:
        sig = sig[None]
    win = int(sample_rate * frame_length_ms / 1000.0)
    hop = int(sample_rate * frame_shift_ms / 1000.0)
    T = sig.shape[-1]
    n_frames = max(0, 1 + (T - win) // hop)  # snip_edges=True
    if n_frames == 0:
        return jnp.zeros((sig.shape[0], 0, num_mel_bins), sig.dtype)
    idx = np.arange(win)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = sig[:, idx]  # [B, F, win]

    if remove_dc_offset:
        frames = frames - frames.mean(axis=-1, keepdims=True)
    if preemphasis:
        prev = jnp.concatenate([frames[..., :1], frames[..., :-1]], axis=-1)
        frames = frames - preemphasis * prev
    n = np.arange(win)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1))
    if window == "povey":
        hann = hann**0.85
    elif window != "hanning":
        raise ValueError(f"unknown window {window!r}")
    frames = frames * jnp.asarray(hann.astype(np.float32))

    pow2 = 1
    while pow2 < win:
        pow2 *= 2
    spec = jnp.fft.rfft(frames, n=pow2, axis=-1)
    power = (spec.real**2 + spec.imag**2)[..., : pow2 // 2]  # drop nyquist
    banks = jnp.asarray(_banks(sample_rate, pow2, num_mel_bins))
    # token-affecting contraction: explicit f32 accumulation (device
    # default would be 1-pass bf16 on TPU and can flip argmin-marginal
    # k-means tokens downstream)
    mel = jnp.einsum("bfn,mn->bfm", power, banks,
                     precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.maximum(mel, EPSILON))


def audiomae_normalize(fbank):
    """The AudioMAE ``(x − mean) / (2·std)`` normalization (AudioSet stats)."""
    return (fbank - AUDIOMAE_NORM_MEAN) / (2.0 * AUDIOMAE_NORM_STD)
