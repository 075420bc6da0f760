"""Per-family serving presets (BENCH_NOTES round 3): env knobs set before
trace; tokens stay bit-exact because the encoder is exact-f32 in every
preset."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.serving import SERVING_PRESETS, apply_serving_preset


_KNOBS = ("ACX_ACT_DTYPE", "ACX_CONV_PRECISION", "ACX_DEC_CONV_PRECISION")


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
