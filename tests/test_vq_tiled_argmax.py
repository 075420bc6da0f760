"""Two-stage (tiled) argmax in vq_encode == plain argmax, ties included.

``quant/vq.py:_argmax_lowest`` engages at C ≥ 16384 (multiple of 128);
the winner AND the lowest-index tie-break must be bit-identical to
``jnp.argmax`` in every case — vq_encode is the token-defining op.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from audiocodecs_tpu.quant.vq import _argmax_lowest, vq_encode


def test_tiled_matches_plain_random(monkeypatch):
    rng = np.random.default_rng(0)
    score = jnp.asarray(rng.standard_normal((7, 16384)), jnp.float32)
    monkeypatch.setenv("ACX_VQ_TILED_ARGMAX", "auto")
    got = np.asarray(_argmax_lowest(score))
    ref = np.asarray(jnp.argmax(score, axis=-1))
    np.testing.assert_array_equal(got, ref)


def test_tiled_tie_break_lowest_index(monkeypatch):
    monkeypatch.setenv("ACX_VQ_TILED_ARGMAX", "auto")
    C = 16384
    score = np.zeros((4, C), np.float32)
    # ties inside one tile, across tiles, and at tile boundaries
    score[0, [5, 9]] = 3.0                 # same tile → 5
    score[1, [100, 300]] = 3.0             # different tiles → 100
    score[2, [127, 128]] = 3.0             # boundary → 127
    score[3, :] = 1.0                      # all-tie → 0
    got = np.asarray(_argmax_lowest(jnp.asarray(score)))
    np.testing.assert_array_equal(got, [5, 100, 127, 0])


def test_gate_respects_env_and_shape(monkeypatch):
    rng = np.random.default_rng(1)
    # non-multiple-of-128 C falls back to plain argmax
    s = jnp.asarray(rng.standard_normal((3, 16385)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_argmax_lowest(s)), np.asarray(jnp.argmax(s, axis=-1)))
    # disabled via env
    monkeypatch.setenv("ACX_VQ_TILED_ARGMAX", "0")
    s2 = jnp.asarray(rng.standard_normal((3, 16384)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(_argmax_lowest(s2)), np.asarray(jnp.argmax(s2, axis=-1)))


@pytest.mark.parametrize("C", [16384, 32768])
def test_vq_encode_tokens_invariant(monkeypatch, C):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 40, 8)), jnp.float32)
    cb = jnp.asarray(rng.standard_normal((C, 8)), jnp.float32)
    monkeypatch.setenv("ACX_VQ_TILED_ARGMAX", "0")
    ref = np.asarray(vq_encode(x, cb))
    monkeypatch.setenv("ACX_VQ_TILED_ARGMAX", "auto")
    got = np.asarray(vq_encode(x, cb))
    np.testing.assert_array_equal(got, ref)
