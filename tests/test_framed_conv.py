"""Framed (huge-stride) conv fast path == native lowering.

``ACX_FRAMED_CONV=auto`` rewrites K=m·s strided convs as reshape+matmul
(``nn/layers.py:_conv1d_framed`` / ``_conv_transpose1d_framed``) —
the patchify stems of MagiCodec/StableCodec (k=640, s=320) are the
engaged call sites. These tests pin exact agreement with the native
``lax.conv_general_dilated`` forms at f32/HIGHEST on every shape class
the gate admits (K=s, K=2s, K=3s; Cin=1 and wide; odd leftover tail).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from audiocodecs_tpu.nn.layers import (
    _conv1d_framed,
    _conv_transpose1d_framed,
    conv1d,
    conv_transpose1d,
)


def _native_conv(x, w, b, stride):
    y = lax.conv_general_dilated(
        x, w, (stride,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=lax.Precision.HIGHEST)
    return y + b


def _native_convtr(x, w, b, stride):
    k = w.shape[0]
    y = lax.conv_general_dilated(
        x, w, (1,), [(k - 1, k - 1)], lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=lax.Precision.HIGHEST)
    return y + b


@pytest.mark.parametrize("m,stride,cin,cout,T", [
    (2, 32, 1, 16, 1000),     # patchify-stem shape class (odd tail)
    (2, 320, 1, 64, 16000),   # MagiCodec/StableCodec patch
    (1, 64, 3, 8, 640),       # K == s
    (3, 32, 4, 8, 1003),      # K == 3s, wide Cin, ragged tail
])
def test_conv1d_framed_exact(m, stride, cin, cout, T):
    rng = np.random.default_rng(0)
    K = m * stride
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = _native_conv(x, w, b, stride)
    got = _conv1d_framed(x, w, b, stride, lax.Precision.HIGHEST)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


@pytest.mark.parametrize("m,stride,cin,cout,T", [
    (2, 320, 64, 1, 50),      # MagiCodec/StableCodec unpatch
    (1, 64, 8, 3, 40),
    (3, 32, 8, 4, 33),
])
def test_conv_transpose1d_framed_exact(m, stride, cin, cout, T):
    rng = np.random.default_rng(1)
    K = m * stride
    x = jnp.asarray(rng.standard_normal((2, T, cin)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, cin, cout)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
    ref = _native_convtr(x, w, b, stride)
    got = _conv_transpose1d_framed(x, w, b, stride, lax.Precision.HIGHEST)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=2e-5)


def test_gate_engages_only_on_framable_shapes(monkeypatch):
    from audiocodecs_tpu.nn.layers import _framed_engaged

    monkeypatch.delenv("ACX_FRAMED_CONV", raising=False)
    assert _framed_engaged(320, 640, 1, 1)          # patch stem
    assert not _framed_engaged(320, 641, 1, 1)      # K % s != 0
    assert not _framed_engaged(8, 16, 1, 1)         # small stride
    assert not _framed_engaged(320, 640, 2, 1)      # dilated
    assert not _framed_engaged(320, 640, 1, 2)      # grouped
    monkeypatch.setenv("ACX_FRAMED_CONV", "0")
    assert not _framed_engaged(320, 640, 1, 1)
    monkeypatch.setenv("ACX_FRAMED_CONV", "1")
    assert _framed_engaged(4, 8, 1, 1)              # forced: floor drops


def test_public_entrypoints_match_forced_modes(monkeypatch):
    """conv1d/conv_transpose1d agree between ACX_FRAMED_CONV=0 and =1 on
    the MagiCodec patch/unpatch shapes (jitted, f32)."""
    rng = np.random.default_rng(2)
    sig = jnp.asarray(rng.standard_normal((2, 3200, 1)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((640, 1, 32)) * 0.02, jnp.float32)
    b = jnp.zeros((32,), jnp.float32)
    h = jnp.asarray(rng.standard_normal((2, 10, 32)), jnp.float32)
    wt = jnp.asarray(rng.standard_normal((640, 32, 1)) * 0.02, jnp.float32)
    bt = jnp.zeros((1,), jnp.float32)

    outs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("ACX_FRAMED_CONV", mode)
        outs[mode] = (
            np.asarray(jax.jit(
                lambda s, ww, bb: conv1d(s, ww, bb, stride=320))(sig, w, b)),
            np.asarray(jax.jit(
                lambda x, ww, bb: conv_transpose1d(x, ww, bb, stride=320))(
                    h, wt, bt)),
        )
    np.testing.assert_allclose(outs["0"][0], outs["1"][0], rtol=0, atol=2e-5)
    np.testing.assert_allclose(outs["0"][1], outs["1"][1], rtol=0, atol=2e-5)
