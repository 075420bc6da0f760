"""Per-family serving presets (BENCH_NOTES round 3): env knobs set before
trace; tokens stay bit-exact because the encoder is exact-f32 in every
preset."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.serving import SERVING_PRESETS, apply_serving_preset


_KNOBS = ("ACX_ACT_DTYPE", "ACX_CONV_PRECISION", "ACX_DEC_CONV_PRECISION",
          "ACX_SNAKE_APPROX", "ACX_PALLAS_DAC_RESUNIT",
          "ACX_PALLAS_LSTM_WIDE")


@pytest.fixture(autouse=True)
def clean_env():
    """Snapshot + restore the precision knobs around every test.

    ``apply_serving_preset`` writes ``os.environ`` directly, which
    ``monkeypatch.delenv(raising=False)`` does NOT undo for keys that were
    unset at fixture time — that leaked ``ACX_ACT_DTYPE=decoder-bfloat16``
    into later test files and broke streaming bit-exactness asserts."""
    import os

    saved = {k: os.environ.pop(k, None) for k in _KNOBS}
    yield
    for k in _KNOBS:
        os.environ.pop(k, None)
    for k, v in saved.items():
        if v is not None:
            os.environ[k] = v


def test_presets_never_lower_encoder_precision():
    import os

    for fam in SERVING_PRESETS:
        env = apply_serving_preset(fam)
        assert env["ACX_CONV_PRECISION"] == "highest", fam
        assert env["ACX_ACT_DTYPE"] in ("float32", "decoder-bfloat16"), fam
        # fast tier too
        env = apply_serving_preset(fam, "fast")
        assert env["ACX_CONV_PRECISION"] == "highest", fam
        assert env["ACX_ACT_DTYPE"] != "bfloat16", fam
    os.environ.pop("ACX_DEC_CONV_PRECISION", None)


def test_exact_quality_clears_knobs():
    import os

    apply_serving_preset("dac")
    assert os.environ["ACX_DEC_CONV_PRECISION"] == "high"
    apply_serving_preset("dac", "exact")
    assert "ACX_DEC_CONV_PRECISION" not in os.environ
    assert os.environ["ACX_ACT_DTYPE"] == "float32"


def test_unknown_family_is_noop():
    assert apply_serving_preset("nosuchfamily") == {}
    with pytest.raises(ValueError, match="quality"):
        apply_serving_preset("dac", "turbo")


def test_dac_preset_tokens_bit_exact(monkeypatch, rng):
    """Tokens under the DAC preset == tokens under exact mode."""
    from audiocodecs_tpu.models.dac import DAC, DACModelConfig

    cfg = DACModelConfig(
        sampling_rate=800, encoder_hidden_size=8, downsampling_ratios=(4, 2),
        decoder_hidden_size=16, upsampling_ratios=(2, 4), n_codebooks=2,
        codebook_size=16, codebook_dim=4, hidden_size=16,
    )
    codec = DAC(800, 800, num_codebooks=2, model_config=cfg,
                key=jax.random.PRNGKey(0))
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32) * 0.3)
    apply_serving_preset("dac", "exact")
    ref = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    apply_serving_preset("dac", "fast")
    got = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    np.testing.assert_array_equal(ref, got)


def test_dac_batch_crossover():
    """DAC-lineage presets flip to the bf16-activation throughput tier at
    batch >= 4 (measured crossover, BENCH_NOTES round 3); EnCodec-lineage
    presets are batch-invariant."""
    lat = apply_serving_preset("dac", batch=1)
    assert lat["ACX_DEC_CONV_PRECISION"] == "high"
    # latency tier never turns the poly snake on
    assert not lat.get("ACX_SNAKE_APPROX")
    thr = apply_serving_preset("dac", batch=8)
    assert thr["ACX_ACT_DTYPE"] == "decoder-bfloat16"
    assert not thr.get("ACX_DEC_CONV_PRECISION")
    # throughput tier ships the decode-only polynomial snake (gated:
    # deviation inside the bf16 noise floor, bench_results/dac_poly_r5)
    assert thr["ACX_SNAKE_APPROX"] == "1"
    assert os.environ.get("ACX_SNAKE_APPROX") == "1"
    assert apply_serving_preset("encodec", batch=8) == \
        apply_serving_preset("encodec", batch=1)
    # ...and EnCodec-lineage presets CLEAR a stale snake knob
    assert os.environ.get("ACX_SNAKE_APPROX") is None
    # batch omitted -> latency tier unchanged (back-compat)
    assert apply_serving_preset("dac") == lat


def test_bigcodec_preset_decoder_wide_lstm():
    """BigCodec's preset ships the decoder-gated wide Pallas LSTM and the
    decode-only poly snake; encoder precision stays HIGHEST (token bar)."""
    env = apply_serving_preset("bigcodec", batch=4)
    assert env["ACX_PALLAS_LSTM_WIDE"] == "decoder"
    assert env["ACX_SNAKE_APPROX"] == "1"
    assert env["ACX_CONV_PRECISION"] == "highest"
    assert env["ACX_ACT_DTYPE"] == "decoder-bfloat16"
    # batch>=4 must NOT reroute bigcodec onto the DAC resunit tier (the
    # fused kernel is untested on bigcodec's bf16/wide-channel decoder)
    assert not env.get("ACX_PALLAS_DAC_RESUNIT")
    # other presets clear the wide-LSTM knob (no cross-family leak)
    apply_serving_preset("encodec")
    assert os.environ.get("ACX_PALLAS_LSTM_WIDE") is None


def test_wide_lstm_decoder_role_gate(monkeypatch):
    """ACX_PALLAS_LSTM_WIDE=decoder enables H<=1536 only inside a
    conv_role("decoder") scope (encoder-side wide kernel measured
    token_match 0.9991 on BigCodec — BENCH_NOTES round 5)."""
    from audiocodecs_tpu.nn import lstm as lstm_mod
    from audiocodecs_tpu.nn.layers import conv_role

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.delenv("ACX_PALLAS_LSTM", raising=False)

    monkeypatch.setenv("ACX_PALLAS_LSTM_WIDE", "decoder")
    assert not lstm_mod._pallas_enabled(1536)  # encoder role: off
    with conv_role("decoder"):
        assert lstm_mod._pallas_enabled(1536)  # decoder role: on
        assert not lstm_mod._pallas_enabled(2048)  # past the wide cap
    assert lstm_mod._pallas_enabled(768)  # narrow path role-independent

    monkeypatch.setenv("ACX_PALLAS_LSTM_WIDE", "1")
    assert lstm_mod._pallas_enabled(1536)  # unconditional wide
    monkeypatch.delenv("ACX_PALLAS_LSTM_WIDE")
    assert not lstm_mod._pallas_enabled(1536)  # default: scan


def test_bigcodec_preset_tokens_bit_exact(rng):
    """Tokens under the bigcodec preset == tokens under exact mode (the
    decoder-only knobs cannot reach the quantizer argmin)."""
    from audiocodecs_tpu.models.bigcodec import BigCodec, BigCodecModelConfig

    cfg = BigCodecModelConfig(ngf=4, up_ratios=(2, 5), dilations=(1, 3),
                              hidden_size=16, codebook_size=64,
                              codebook_dim=8, rnn_layers=1)
    codec = BigCodec(16000, 16000, model_config=cfg,
                     key=jax.random.PRNGKey(0))
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32) * 0.3)
    apply_serving_preset("bigcodec", "exact")
    ref = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    rec_exact = np.asarray(codec._toks_to_sig(codec.params, ref, None))
    apply_serving_preset("bigcodec", batch=4)
    got = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    np.testing.assert_array_equal(ref, got)
    # decode still runs under the full preset (poly snake + role scope)
    rec = np.asarray(codec._toks_to_sig(codec.params, ref, None))
    assert np.isfinite(rec).all()
    # isolate the poly snake (f32 activations): its deviation must be
    # negligible — the bf16-activation tier's own noise dominates and is
    # already accepted by the preset (measured 0.127 rel on this tiny
    # saturating random model vs 4e-6 for the poly alone)
    os.environ["ACX_ACT_DTYPE"] = "float32"
    rec_poly = np.asarray(codec._toks_to_sig(codec.params, ref, None))
    scale = max(np.abs(rec_exact).max(), 1e-6)
    assert np.abs(rec_poly - rec_exact).max() / scale < 1e-3
