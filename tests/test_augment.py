"""Waveform augmentation (DropFreq/DropChunk, reference
``hparams/tasks/asr.yaml:62-93`` + ``train_asr.py:46-48``): jittable,
static-shape, explicit-key; cache-bypass rule covered in the recipe test."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.augment import (
    build_augmenter,
    drop_chunk,
    drop_freq,
)


@pytest.fixture
def sig(rng):
    return jnp.asarray(rng.standard_normal((3, 4000)).astype(np.float32))


def test_drop_chunk_zeros_within_valid_region(sig):
    lengths = jnp.asarray([4000, 2000, 1000])
    out = drop_chunk(sig, jax.random.PRNGKey(0), lengths,
                     length_low=20, length_high=40,
                     count_low=5, count_high=10)
    out = np.asarray(out)
    x = np.asarray(sig)
    changed = out != x
    assert changed.any()
    # changed samples are exactly zeroed, never altered otherwise
    assert np.all(out[changed] == 0.0)
    # nothing outside the valid region of row 2 is touched
    assert not changed[2, 1000:].any()


def test_drop_chunk_count_bounds(sig):
    # count_high chunks of exactly length 1 → at most count_high zeros/row
    out = np.asarray(drop_chunk(sig, jax.random.PRNGKey(1),
                                length_low=1, length_high=1,
                                count_low=3, count_high=7))
    changed = (out != np.asarray(sig)).sum(axis=1)
    assert (changed <= 7).all() and (changed >= 1).all()


def test_drop_freq_notches_target_band(rng):
    # pure 1 kHz tone @ 16 kHz → notch centred there kills most energy
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)[None]
    sig2 = jnp.asarray(np.repeat(tone, 2, 0))
    rel = 1000.0 / 8000.0  # relative to Nyquist
    out = np.asarray(drop_freq(sig2, jax.random.PRNGKey(2),
                               freq_low=rel - 1e-6, freq_high=rel + 1e-6,
                               count_low=1, count_high=1, width=0.05))
    e_in = float((np.asarray(sig2)[0, 2000:-2000] ** 2).mean())
    e_out = float((out[0, 2000:-2000] ** 2).mean())
    assert e_out < 0.05 * e_in, (e_in, e_out)


def test_drop_freq_preserves_out_of_band(rng):
    t = np.arange(16000) / 16000.0
    tone = np.sin(2 * np.pi * 500.0 * t).astype(np.float32)[None]
    sig1 = jnp.asarray(tone)
    out = np.asarray(drop_freq(sig1, jax.random.PRNGKey(3),
                               freq_low=0.7, freq_high=0.9,
                               count_low=1, count_high=1, width=0.02))
    e_in = float((tone[0, 2000:-2000] ** 2).mean())
    e_out = float((out[0, 2000:-2000] ** 2).mean())
    assert e_out > 0.8 * e_in


def test_build_augmenter_prob_gating(sig):
    aug = build_augmenter({"augment_prob": 0.0})
    out = np.asarray(aug(sig, jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out, np.asarray(sig))  # all coin flips lose

    aug = build_augmenter({"augment_prob": 1.0, "drop_count_low": 50,
                           "drop_count_high": 60})
    out = np.asarray(aug(sig, jax.random.PRNGKey(0)))
    assert (out != np.asarray(sig)).any()


def test_augmenter_deterministic_per_key(sig):
    aug = build_augmenter({"augment_prob": 1.0})
    a = np.asarray(aug(sig, jax.random.PRNGKey(7)))
    b = np.asarray(aug(sig, jax.random.PRNGKey(7)))
    c = np.asarray(aug(sig, jax.random.PRNGKey(8)))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()
