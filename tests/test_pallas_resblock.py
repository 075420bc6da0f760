"""Fused SEANet residual block kernel parity (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import pad1d
from audiocodecs_tpu.nn.seanet import SEANetConfig, _apply_resnet
from audiocodecs_tpu.ops.seanet_block_pallas import seanet_resblock_pallas


def make_params(rng, C, H):
    def c(k, i, o):
        return {
            "w": jnp.asarray(rng.standard_normal((k, i, o)).astype(np.float32) * 0.1),
            "b": jnp.asarray(rng.standard_normal(o).astype(np.float32) * 0.1),
        }

    return {"block": [c(3, C, H), c(1, H, C)], "shortcut": c(1, C, C)}


@pytest.mark.parametrize("pad_mode", ["reflect", "constant"])
@pytest.mark.parametrize("T,tile", [(100, 32), (64, 64), (130, 64)])
def test_matches_xla_path(rng, pad_mode, T, tile):
    C, H = 32, 16
    p = make_params(rng, C, H)
    cfg = SEANetConfig(causal=True, pad_mode=pad_mode)
    x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
    want = _apply_resnet(x, p, cfg, (1, 1))  # pallas auto-off on CPU
    xp = pad1d(x, 2, 0, mode=pad_mode)
    got = seanet_resblock_pallas(
        xp, p["block"][0]["w"], p["block"][0]["b"],
        p["block"][1]["w"][0], p["block"][1]["b"],
        p["shortcut"]["w"][0], p["shortcut"]["b"],
        tile=tile, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_polyphase_convtr_matches_naive(rng):
    import os

    from audiocodecs_tpu.nn.layers import conv_transpose1d
    from audiocodecs_tpu.nn.seanet import _polyphase_causal_convtr

    for s, Cin, Cout, T in ((8, 16, 8, 17), (5, 8, 4, 10), (2, 4, 4, 9)):
        K = 2 * s
        w = jnp.asarray(rng.standard_normal((K, Cin, Cout)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal(Cout).astype(np.float32))
        x = jnp.asarray(rng.standard_normal((2, T, Cin)).astype(np.float32))
        full = conv_transpose1d(x, w, b, stride=s)
        want = full[:, : full.shape[1] - (K - s)]
        got = _polyphase_causal_convtr(x, w, b, s)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)


def test_packed_resblock_matches_xla(rng):
    """Packed-lane kernel (v2): interpret-mode parity (constant pad)."""
    from audiocodecs_tpu.ops.seanet_block_packed import seanet_resblock_packed

    for C, H, T, rows in ((32, 16, 100, 8), (64, 32, 64, 4)):
        p = make_params(rng, C, H)
        cfg = SEANetConfig(causal=True, pad_mode="constant")
        x = jnp.asarray(rng.standard_normal((2, T, C)).astype(np.float32))
        want = _apply_resnet(x, p, cfg, (1, 1))
        got = seanet_resblock_packed(
            x, p["block"][0]["w"], p["block"][0]["b"],
            p["block"][1]["w"][0], p["block"][1]["b"],
            p["shortcut"]["w"][0], p["shortcut"]["b"],
            tile_rows=rows, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-6)
