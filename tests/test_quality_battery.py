"""Unit tests for the shared recipe quality battery (recipes/quality.py)."""

import numpy as np

from audiocodecs_tpu.downstream.recipes.quality import (
    PairBattery,
    build_quality_metrics,
    trim_row,
)


def test_trim_row():
    sig = np.arange(10, dtype=np.float32)
    assert trim_row(sig, 0.5).shape == (5,)
    assert trim_row(sig, 0.0).shape == (1,)  # never empty
    assert trim_row(sig, 1.0).shape == (10,)


def test_gates_off_by_default():
    q = build_quality_metrics({"dnsmos_params": ""}, 16000)
    assert q["dwer"] is None and q["spk"] is None and q["ppl"] is None
    assert "UTMOS" not in q["single"]


def test_pair_battery_dsp_rows_and_prefixes(tmp_path):
    sr = 16000
    rng = np.random.default_rng(0)
    ref = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    hyp = ref + (rng.standard_normal(sr) * 0.01).astype(np.float32)

    b = PairBattery({"dnsmos_params": ""}, sr)  # DSP rows only
    b.score_pair(hyp, ref, uid="u1")
    b.score_pair(ref, ref, prefix="Rec", uid="u1")
    s = b.summary()
    for key in ("STOI", "PESQ", "MelD", "STFTD", "RecSTOI", "RecPESQ"):
        assert key in s and np.isfinite(s[key]), key
    # identical signals score at the metric ceilings / floors
    assert s["RecMelD"] < 1e-3 and s["RecSTFTD"] < 1e-3
    assert s["RecSTOI"] > 0.99
    # near-identical beats what heavy corruption would score
    assert s["MelD"] < 10.0

    b.write_stats(str(tmp_path))
    lines = (tmp_path / "stoi.txt").read_text().strip().splitlines()
    assert lines[0].startswith("u1\t") and lines[-1].startswith("# mean")


def test_pair_battery_length_mismatch():
    """hyp/ref of different lengths are truncated to the overlap."""
    sr = 16000
    rng = np.random.default_rng(1)
    ref = (rng.standard_normal(sr) * 0.2).astype(np.float32)
    b = PairBattery({"dnsmos_params": ""}, sr)
    b.score_pair(ref[: sr // 2], ref)  # hyp shorter
    b.score_pair(ref, ref[: sr // 2])  # ref shorter
    s = b.summary()
    assert np.isfinite(s["STOI"]) and np.isfinite(s["PESQ"])
