"""bf16-activation conv path (ACX_ACT_DTYPE=bfloat16): f32 islands keep
tokens/IO exact-typed; token agreement vs the f32 path is measured and the
quantizer boundary is verified to stay f32."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture
def bf16_env(monkeypatch):
    monkeypatch.setenv("ACX_ACT_DTYPE", "bfloat16")
    monkeypatch.delenv("ACX_CONV_PRECISION", raising=False)
    yield


def _toy_encodec():
    from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig

    cfg = EncodecModelConfig(
        sampling_rate=800, num_filters=8, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=64, codebook_dim=16,
        num_quantizers=4,
    )
    return Encodec(800, 800, num_codebooks=4, model_config=cfg,
                   key=jax.random.PRNGKey(0))


def test_act_dtype_knob(monkeypatch):
    from audiocodecs_tpu.nn.layers import act_dtype, conv_precision
    from jax import lax

    monkeypatch.delenv("ACX_ACT_DTYPE", raising=False)
    monkeypatch.delenv("ACX_CONV_PRECISION", raising=False)
    assert act_dtype() == jnp.float32
    assert conv_precision() == lax.Precision.HIGHEST
    monkeypatch.setenv("ACX_ACT_DTYPE", "bfloat16")
    assert act_dtype() == jnp.bfloat16
    assert act_dtype("decoder") == jnp.bfloat16
    monkeypatch.setenv("ACX_ACT_DTYPE", "decoder-bfloat16")
    assert act_dtype("encoder") == jnp.float32
    assert act_dtype("decoder") == jnp.bfloat16
    # conv1d drops to DEFAULT precision on bf16 operands regardless of env
    from audiocodecs_tpu.nn.layers import conv1d

    y = conv1d(jnp.zeros((1, 8, 4), jnp.bfloat16),
               jnp.zeros((3, 4, 4), jnp.bfloat16))
    assert y.dtype == jnp.bfloat16


def test_bf16_roundtrip_outputs_f32(bf16_env, rng):
    codec = _toy_encodec()
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32) * 0.3)
    feats = codec._sig_to_feats(codec.params, sig, None)
    assert feats.dtype == jnp.float32  # f32 island at the quantizer boundary
    toks = codec.sig_to_toks(sig)
    assert toks.dtype == jnp.int32 or np.issubdtype(np.asarray(toks).dtype,
                                                    np.integer)
    rec = codec.toks_to_sig(toks)
    assert rec.dtype == jnp.float32
    assert np.isfinite(np.asarray(rec)).all()


def test_bf16_token_agreement_and_waveform_error(rng):
    codec = _toy_encodec()
    sig = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32) * 0.3)

    os.environ.pop("ACX_ACT_DTYPE", None)
    toks_f32 = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    rec_f32 = np.asarray(codec._toks_to_sig(
        codec.params, jnp.asarray(toks_f32), None))
    try:
        os.environ["ACX_ACT_DTYPE"] = "bfloat16"
        toks_bf = np.asarray(codec._sig_to_toks(codec.params, sig, None))
        rec_bf = np.asarray(codec._toks_to_sig(
            codec.params, jnp.asarray(toks_f32), None))
    finally:
        os.environ.pop("ACX_ACT_DTYPE", None)

    match = (toks_bf == toks_f32).mean()
    assert match >= 0.95, f"bf16 token agreement {match:.3f}"
    # decode error bounded by bf16 resolution, not exploding through stack
    scale = np.abs(rec_f32).max() + 1e-9
    err = np.abs(rec_bf - rec_f32).max() / scale
    assert err < 0.1, f"relative decode error {err:.4f}"


def test_bf16_dac_path(bf16_env, rng):
    from audiocodecs_tpu.models.dac import DAC, DACModelConfig

    cfg = DACModelConfig(
        sampling_rate=800, encoder_hidden_size=8, downsampling_ratios=(4, 2),
        decoder_hidden_size=16, upsampling_ratios=(2, 4), n_codebooks=2,
        codebook_size=16, codebook_dim=4, hidden_size=16,
    )
    codec = DAC(800, 800, num_codebooks=2, model_config=cfg,
                key=jax.random.PRNGKey(0))
    sig = jnp.asarray(rng.standard_normal((1, 400)).astype(np.float32) * 0.3)
    toks = codec.sig_to_toks(sig)
    rec = codec.toks_to_sig(toks)
    assert rec.dtype == jnp.float32
    assert np.isfinite(np.asarray(rec)).all()


def test_unfold_conv_layout_matches_native():
    """Opt-in unfold-einsum conv layout (ACX_CONV_LAYOUT) is numerically
    the native conv across stride/dilation/kernel combos."""
    import os

    import numpy as np
    import jax.numpy as jnp

    from audiocodecs_tpu.nn import layers as L

    rng = np.random.default_rng(0)
    prev = os.environ.get("ACX_CONV_LAYOUT")
    try:
        for (K, Cin, Cout, s, d) in [(7, 32, 32, 1, 1), (4, 32, 64, 2, 1),
                                     (3, 16, 32, 1, 3), (7, 1, 32, 1, 1),
                                     (10, 8, 16, 5, 1)]:
            x = jnp.asarray(rng.standard_normal((2, 301, Cin)), jnp.float32)
            w = jnp.asarray(
                rng.standard_normal((K, Cin, Cout)) * 0.1, jnp.float32)
            b = jnp.asarray(rng.standard_normal(Cout), jnp.float32)
            os.environ["ACX_CONV_LAYOUT"] = "native"
            y1 = L.conv1d(x, w, b, stride=s, dilation=d)
            os.environ["ACX_CONV_LAYOUT"] = "unfold"
            y2 = L.conv1d(x, w, b, stride=s, dilation=d)
            assert y1.shape == y2.shape
            np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                                       atol=1e-5, rtol=1e-5)
    finally:
        if prev is None:
            os.environ.pop("ACX_CONV_LAYOUT", None)
        else:
            os.environ["ACX_CONV_LAYOUT"] = prev


def test_dec_conv_precision_role_scope(monkeypatch, rng):
    """ACX_DEC_CONV_PRECISION lowers DECODE-side conv precision only:
    tokens stay bit-identical (argmin boundary is encode-side), decoded
    waveform changes slightly, and the role scope restores afterwards."""
    from jax import lax

    from audiocodecs_tpu.models.dac import DAC, DACModelConfig
    from audiocodecs_tpu.nn import layers

    monkeypatch.delenv("ACX_ACT_DTYPE", raising=False)
    monkeypatch.delenv("ACX_CONV_PRECISION", raising=False)
    cfg = DACModelConfig(
        sampling_rate=800, encoder_hidden_size=8, downsampling_ratios=(4, 2),
        decoder_hidden_size=16, upsampling_ratios=(2, 4), n_codebooks=2,
        codebook_size=16, codebook_dim=4, hidden_size=16,
    )
    codec = DAC(800, 800, num_codebooks=2, model_config=cfg,
                key=jax.random.PRNGKey(0))
    sig = jnp.asarray(rng.standard_normal((1, 400)).astype(np.float32) * 0.3)
    toks_hi = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    rec_hi = np.asarray(codec._toks_to_sig(
        codec.params, jnp.asarray(toks_hi), None))

    monkeypatch.setenv("ACX_DEC_CONV_PRECISION", "default")
    toks_lo = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    rec_lo = np.asarray(codec._toks_to_sig(
        codec.params, jnp.asarray(toks_hi), None))
    np.testing.assert_array_equal(toks_lo, toks_hi)  # encode untouched
    scale = np.abs(rec_hi).max() + 1e-9
    err = np.abs(rec_lo - rec_hi).max() / scale
    assert err < 0.1, f"decode drifted too far: {err:.4f}"

    # outside any decoder scope the knob is inert
    assert layers.conv_precision() == lax.Precision.HIGHEST
    with layers.conv_role("decoder"):
        assert layers.conv_precision() == lax.Precision.DEFAULT
    assert layers.conv_precision() == lax.Precision.HIGHEST


def test_packed_stem_conv_bit_exact(monkeypatch, rng):
    """ACX_PACK_STEM (batch→lanes for C_in=1 stems) is bit-identical to
    the native conv — same K-tap contraction per output."""
    from audiocodecs_tpu.nn.layers import conv1d

    x = jnp.asarray(rng.standard_normal((4, 999, 1)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((7, 1, 32)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((32,)).astype(np.float32))
    monkeypatch.setenv("ACX_PACK_STEM", "0")
    ref = np.asarray(conv1d(x, w, b, stride=2, dilation=3))
    monkeypatch.setenv("ACX_PACK_STEM", "1")
    got = np.asarray(conv1d(x, w, b, stride=2, dilation=3))
    np.testing.assert_array_equal(ref, got)
    # batch-1 and k=1 fall through to the native path untouched
    y1 = conv1d(x[:1], w, b)
    assert y1.shape[0] == 1
