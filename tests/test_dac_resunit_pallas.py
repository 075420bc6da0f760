"""Fused decode-side DAC residual unit: interpret-mode parity vs the XLA
reference path at every dilation, plus the auto-gating rules."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.models.dac import _residual_unit
from audiocodecs_tpu.ops.dac_resunit_pallas import dac_resunit_pallas


def _unit_params(rng, C):
    return {
        "alpha1": jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5,
                              jnp.float32),
        "conv1": {"w": jnp.asarray(
            rng.standard_normal((7, C, C)) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)},
        "alpha2": jnp.asarray(np.abs(rng.standard_normal(C)) + 0.5,
                              jnp.float32),
        "conv2": {"w": jnp.asarray(
            rng.standard_normal((1, C, C)) * 0.05, jnp.float32),
            "b": jnp.asarray(rng.standard_normal(C) * 0.1, jnp.float32)},
    }


@pytest.mark.parametrize("dilation", [1, 3, 9])
@pytest.mark.parametrize("T", [700, 1024])
def test_interpret_parity(rng, dilation, T, monkeypatch):
    monkeypatch.setenv("ACX_PALLAS_DAC_RESUNIT", "0")  # XLA reference
    C = 8
    p = _unit_params(rng, C)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    want = np.asarray(_residual_unit(x, p, dilation))
    got = np.asarray(dac_resunit_pallas(
        x, p["conv1"]["w"], p["conv1"]["b"], p["alpha1"],
        p["conv2"]["w"], p["conv2"]["b"], p["alpha2"],
        dilation=dilation, tile=256, interpret=True,
        precision_name="highest"))
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_interpret_parity_poly_snake(rng, monkeypatch):
    """snake_poly=True matches the XLA poly path (ACX_SNAKE_APPROX=1)."""
    from audiocodecs_tpu.nn import layers

    C, T, dilation = 8, 700, 3
    p = _unit_params(rng, C)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    monkeypatch.setenv("ACX_PALLAS_DAC_RESUNIT", "0")
    monkeypatch.setenv("ACX_SNAKE_APPROX", "1")
    with layers.conv_role("decoder"):  # poly is decode-role-gated
        want = np.asarray(_residual_unit(x, p, dilation))
    got = np.asarray(dac_resunit_pallas(
        x, p["conv1"]["w"], p["conv1"]["b"], p["alpha1"],
        p["conv2"]["w"], p["conv2"]["b"], p["alpha2"],
        dilation=dilation, tile=256, interpret=True,
        precision_name="highest", snake_poly=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    # and the poly kernel ≠ exact kernel on the same inputs only at the
    # approximation scale (sanity that the flag actually switches paths)
    exact = np.asarray(dac_resunit_pallas(
        x, p["conv1"]["w"], p["conv1"]["b"], p["alpha1"],
        p["conv2"]["w"], p["conv2"]["b"], p["alpha2"],
        dilation=dilation, tile=256, interpret=True,
        precision_name="highest", snake_poly=False))
    assert np.abs(exact - got).max() < 1e-4


def test_forced_mode_is_decode_role_gated(monkeypatch):
    """ACX_PALLAS_DAC_RESUNIT=1 must never engage on the encoder."""
    from audiocodecs_tpu.models.dac import _resunit_pallas_mode
    from audiocodecs_tpu.nn import layers

    x32 = jnp.zeros((1, 64, 32), jnp.float32)
    monkeypatch.setenv("ACX_PALLAS_DAC_RESUNIT", "1")
    assert _resunit_pallas_mode(x32) is None  # encoder role
    with layers.conv_role("decoder"):
        assert _resunit_pallas_mode(x32) is not None
        # forced mode drops auto's dtype gate: bf16 acts allowed on decode
        assert _resunit_pallas_mode(x32.astype(jnp.bfloat16)) is not None


def test_auto_gating(monkeypatch):
    from audiocodecs_tpu.models.dac import _resunit_pallas_mode
    from audiocodecs_tpu.nn import layers

    x32 = jnp.zeros((1, 64, 32), jnp.float32)
    monkeypatch.setenv("ACX_PALLAS_DAC_RESUNIT", "auto")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # encode side: never auto-engage (token exactness owns that path)
    assert _resunit_pallas_mode(x32) is None
    with layers.conv_role("decoder"):
        assert _resunit_pallas_mode(x32) is not None
        # decoder precision env flows into the kernel precision
        monkeypatch.setenv("ACX_DEC_CONV_PRECISION", "high")
        assert _resunit_pallas_mode(x32) == "high"
        # bf16 activations or very wide stages fall back to XLA
        assert _resunit_pallas_mode(x32.astype(jnp.bfloat16)) is None
        assert _resunit_pallas_mode(
            jnp.zeros((1, 8, 512), jnp.float32)) is None
    monkeypatch.setenv("ACX_PALLAS_DAC_RESUNIT", "0")
    with layers.conv_role("decoder"):
        assert _resunit_pallas_mode(x32) is None
    # default (unset) is OFF — measured neutral vs XLA (BENCH_NOTES r3)
    monkeypatch.delenv("ACX_PALLAS_DAC_RESUNIT", raising=False)
    with layers.conv_role("decoder"):
        assert _resunit_pallas_mode(x32) is None
