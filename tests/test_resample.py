"""Resampler tests.

The oracle is an independent numpy implementation of torchaudio's
``functional.resample`` algorithm (direct per-output-sample evaluation of the
windowed-sinc interpolation — a different computation order than the
framework's single strided conv), plus a scipy polyphase cross-check for
spectral quality.
"""

import math

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from audiocodecs_tpu.resample import resample, resample_kernel, resampled_length

pytestmark = pytest.mark.quick


def naive_sinc_resample(x: np.ndarray, orig_freq: int, new_freq: int,
                        lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Direct (non-polyphase) evaluation of the same windowed-sinc resampler."""
    gcd = math.gcd(orig_freq, new_freq)
    orig, new = orig_freq // gcd, new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))
    T = x.shape[-1]
    out_len = int(math.ceil(new * T / orig))
    y = np.zeros(x.shape[:-1] + (out_len,), dtype=np.float64)
    xp = np.pad(x.astype(np.float64), [(0, 0)] * (x.ndim - 1) + [(width, width + orig)])
    for o in range(out_len):
        frame, phase = divmod(o, new)
        # times of input taps relative to output sample position
        i0 = frame * orig  # position of first tap in padded input (offset -width)
        taps = np.arange(-width, width + orig)
        t = (-phase / new + taps / orig) * base_freq
        t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
        window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
        tp = t * math.pi
        k = np.where(tp == 0, 1.0, np.sin(tp) / np.where(tp == 0, 1.0, tp))
        k = k * window * (base_freq / orig)
        seg = xp[..., i0 : i0 + len(taps)]
        y[..., o] = (seg * k).sum(-1)
    return y


@pytest.mark.parametrize("orig,new", [(16000, 24000), (24000, 16000),
                                      (10000, 24000), (22050, 16000),
                                      (44100, 16000)])
def test_matches_naive_oracle(rng, orig, new):
    x = rng.standard_normal((2, 1700)).astype(np.float32)
    got = np.asarray(resample(jnp.asarray(x), orig, new))
    want = naive_sinc_resample(x, orig, new)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_identity():
    x = jnp.ones((1, 100))
    assert resample(x, 16000, 16000) is x


def test_output_length():
    for orig, new, T in [(16000, 24000, 16000), (24000, 16000, 24000),
                         (10000, 7000, 12345)]:
        x = jnp.zeros((1, T))
        assert resample(x, orig, new).shape[-1] == resampled_length(T, orig, new)


def test_spectral_quality_vs_scipy(rng):
    """Down-then-up roundtrip of a band-limited tone should be near-lossless."""
    sr = 24000
    t = np.arange(sr, dtype=np.float64) / sr
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None]
    down = np.asarray(resample(jnp.asarray(x), 24000, 16000))
    up = np.asarray(resample(jnp.asarray(down), 16000, 24000))
    n = min(x.shape[-1], up.shape[-1]) - 1000
    err = up[0, 500 : 500 + n] - x[0, 500 : 500 + n]
    snr = 10 * np.log10((x[0, 500 : 500 + n] ** 2).mean() / (err**2).mean())
    assert snr > 40.0, snr
    # scipy polyphase agrees in spectrum (coarse check)
    sp = scipy.signal.resample_poly(x[0], 2, 3)
    f1 = np.abs(np.fft.rfft(down[0][: len(sp)]))
    f2 = np.abs(np.fft.rfft(sp[: len(down[0])]))
    peak1, peak2 = np.argmax(f1), np.argmax(f2)
    assert abs(int(peak1) - int(peak2)) <= 1


def test_kernel_cache():
    k1 = resample_kernel(16000, 24000)
    k2 = resample_kernel(16000, 24000)
    assert k1[0] is k2[0]


def test_batch_and_rank(rng):
    x = rng.standard_normal((3, 2, 800)).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x), 16000, 8000))
    assert y.shape[:2] == (3, 2)
    y0 = np.asarray(resample(jnp.asarray(x[0]), 16000, 8000))
    np.testing.assert_allclose(y[0], y0, atol=1e-6)
