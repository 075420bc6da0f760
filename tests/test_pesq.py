"""First-party PESQ (P.862) property tests.

No ITU conformance vectors exist in this environment (no network, no
``pesq``/torchmetrics wheels — the reference wraps those,
``/root/reference/downstream/metrics/pesq.py:33-58``), so this validates the
properties the algorithm must have: perfect score on identity, the published
MOS-LQO range and mappings, monotone degradation with noise, level-alignment
and time-alignment invariances.
"""

import numpy as np
import pytest

from audiocodecs_tpu.downstream.metrics.pesq import pesq

FS = 16000


@pytest.fixture(scope="module")
def speechlike():
    rng = np.random.default_rng(0)
    t = np.arange(3 * FS) / FS
    env = (np.sin(2 * np.pi * 2.5 * t) ** 2) * (t % 1.0 < 0.7)
    x = env * sum(
        np.sin(2 * np.pi * f0 * t + i)
        for i, f0 in enumerate([220, 440, 660, 880])
    ) * 0.1
    return x + 0.001 * rng.standard_normal(len(t))


def _with_snr(clean, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    n = rng.standard_normal(len(clean))
    n *= np.sqrt((clean**2).mean() / (n**2).mean()) * 10 ** (-snr_db / 20)
    return clean + n


def test_identity_is_max_score(speechlike):
    s = pesq(speechlike, speechlike, FS)
    assert abs(s - 4.6439) < 2e-3  # wb logistic at raw 4.5


def test_monotone_in_snr(speechlike):
    scores = [pesq(_with_snr(speechlike, snr), speechlike, FS)
              for snr in (40, 30, 20, 10, 0)]
    assert all(a >= b - 1e-6 for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 4.0 and scores[-1] < 1.6


def test_score_range(speechlike):
    rng = np.random.default_rng(2)
    worst = pesq(rng.standard_normal(len(speechlike)), speechlike, FS)
    assert 1.0 <= worst <= 5.0
    assert 1.0 <= pesq(speechlike, speechlike, FS) <= 4.65


def test_level_alignment_invariance(speechlike):
    deg = _with_snr(speechlike, 20)
    a = pesq(deg, speechlike, FS)
    b = pesq(0.25 * deg, speechlike, FS)
    c = pesq(deg, 3.0 * speechlike, FS)
    assert abs(a - b) < 0.05 and abs(a - c) < 0.05


def test_time_alignment_invariance(speechlike):
    deg = _with_snr(speechlike, 20)
    a = pesq(deg, speechlike, FS)
    shifted = np.concatenate([np.zeros(160), deg])[: len(deg)]
    assert abs(pesq(shifted, speechlike, FS) - a) < 0.1


def test_narrowband_mode(speechlike):
    deg = _with_snr(speechlike, 20)
    nb = pesq(deg, speechlike, FS, mode="nb")
    assert 1.0 <= nb <= 4.549 + 1e-3  # P.862.1 mapping ceiling
    with pytest.raises(ValueError):
        pesq(deg, speechlike, FS, mode="fb")


def test_resampling_input_rates(speechlike):
    """24 kHz inputs are resampled to 16 kHz like the reference wrapper."""
    from audiocodecs_tpu.downstream.metrics.stoi import _resample_np

    clean24 = _resample_np(speechlike, FS, 24000)
    s = pesq(clean24, clean24, 24000)
    assert s > 4.55


def test_short_input_is_nan():
    assert np.isnan(pesq(np.zeros(100), np.zeros(100), FS))
