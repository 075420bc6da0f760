"""ACX_SNAKE_APPROX: polynomial sin² snake (decoder-only perf knob).

Safety contract: tokens are NEVER affected (encode always runs exact
``jnp.sin``); decoded waveforms deviate below the dec=high precision
mode's measured envelope (7.9e-5, BENCH_NOTES round 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.models.dac import (
    DAC,
    DACModelConfig,
    _snake_sin2_poly,
    snake,
)

TINY = DACModelConfig(
    sampling_rate=16000,
    encoder_hidden_size=8,
    downsampling_ratios=(2, 4, 5),
    decoder_hidden_size=64,
    upsampling_ratios=(5, 4, 2),
    hidden_size=32,
    n_codebooks=4,
    codebook_size=32,
    codebook_dim=4,
)


def test_sin2_poly_matches_exact():
    y = jnp.asarray(
        np.concatenate([
            np.linspace(-40.0, 40.0, 200001),
            np.random.default_rng(0).standard_normal(10000) * 5,
        ]).astype(np.float32))
    got = np.asarray(_snake_sin2_poly(y))
    want = np.sin(np.asarray(y, np.float64)) ** 2
    # poly is 5.5e-9 in f64; the f32 bound is set by range-reduction
    # rounding (~|y|·eps·π amplification), ~3e-6 at |y|=40
    assert np.abs(got - want).max() < 1e-5


def test_snake_knob_decoder_scoped(monkeypatch):
    """Knob on: encoder-role snake stays exact, decoder-role applies the
    polynomial."""
    from audiocodecs_tpu.nn.layers import conv_role

    monkeypatch.setenv("ACX_SNAKE_APPROX", "1")
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((4, 64)).astype(np.float32))
    alpha = jnp.asarray(np.float32(0.7))
    exact = x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)
    outside = snake(x, alpha)  # no decoder role -> exact path
    assert np.array_equal(np.asarray(outside), np.asarray(exact))
    with conv_role("decoder"):
        approx = snake(x, alpha)
    # approx path is numerically close but not the identical program
    assert np.abs(np.asarray(approx) - np.asarray(exact)).max() < 1e-6


def test_dac_tokens_exact_and_waveform_close(monkeypatch):
    sr = 16000
    codec = DAC(sample_rate=sr, orig_sample_rate=sr, num_codebooks=4,
                model_config=TINY, key=jax.random.PRNGKey(0))
    sig = jnp.asarray(
        np.random.default_rng(2).standard_normal((2, 4000)).astype(
            np.float32) * 0.2)

    monkeypatch.delenv("ACX_SNAKE_APPROX", raising=False)
    toks0 = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    rec0 = np.asarray(codec._toks_to_sig(
        codec.params, jnp.asarray(toks0), None))

    monkeypatch.setenv("ACX_SNAKE_APPROX", "1")
    toks1 = np.asarray(codec._sig_to_toks(codec.params, sig, None))
    rec1 = np.asarray(codec._toks_to_sig(
        codec.params, jnp.asarray(toks1), None))

    assert np.array_equal(toks0, toks1), "tokens must be knob-invariant"
    dev = np.abs(rec1 - rec0).max()
    assert dev < 8e-5, f"waveform deviation {dev} above dec=high envelope"
