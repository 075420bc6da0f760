"""Codec scratch-training health: the quality-loop path must actually learn.

Regression for the round-4 encoder-collapse bug: on a *diverse* corpus the
fixed-weight commitment loss (~50x the reconstruction term at init) drove the
encoder to time-constant features, the decoder to silence, and recon MSE to
exactly the signal power (valid SI-SNR -28 dB). The reference never trains
codecs (frozen wrappers only), so this path has no reference counterpart;
the EMA/dead-restart rule follows the EnCodec-lineage EuclideanCodebook
training semantics the pretrained checkpoints were produced with.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig
from audiocodecs_tpu.parallel.train import (
    init_codec_opt_state,
    make_codec_train_step,
)

SR = 800
T = 800


def tiny_cfg():
    return EncodecModelConfig(
        sampling_rate=SR, num_filters=8, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=64, codebook_dim=16,
        num_quantizers=2,
    )


_POOL = None


def corpus_pool():
    """A fixed 24-utterance pool of 2-tone mixtures — a miniature of the
    synthetic-quality corpus: diverse enough to expose the collapse
    attractor (a single repeated signal can be memorized even by a
    collapsed quantizer), finite so a tiny codec can converge."""
    global _POOL
    if _POOL is None:
        rng = np.random.default_rng(42)
        t = np.arange(3 * T, dtype=np.float32) / SR
        pool = []
        for _ in range(24):
            s = np.zeros(3 * T, np.float32)
            for _ in range(2):
                f = rng.uniform(10.0, 60.0)
                a = rng.uniform(0.05, 0.2)
                s += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
            pool.append(s)
        _POOL = pool
    return _POOL


def diverse_batch(rng, batch=8):
    pool = corpus_pool()
    out = np.zeros((batch, T), np.float32)
    for b in range(batch):
        s = pool[rng.integers(len(pool))]
        off = rng.integers(len(s) - T + 1)
        out[b] = s[off:off + T]
    return out


def test_diverse_corpus_training_beats_silence():
    from audiocodecs_tpu.parallel.train import codec_loss

    cfg = tiny_cfg()
    codec = Encodec(SR, SR, model_config=cfg, key=jax.random.PRNGKey(0))
    params = codec.params
    opt = optax.adam(2e-3)
    opt_state = init_codec_opt_state(opt, params, num_codebooks=2)
    step = jax.jit(make_codec_train_step(cfg, 2, opt, commit_warmup=100))

    rng = np.random.default_rng(0)
    for _ in range(500):
        params, opt_state, metrics = step(params, opt_state,
                                          jnp.asarray(diverse_batch(rng)))
    evalb = jnp.asarray(diverse_batch(np.random.default_rng(7)))
    power = float(jnp.mean(evalb ** 2))
    _, (mets, _) = codec_loss(params, evalb, cfg, 2, ema=True)
    recon = float(mets["recon"])
    # A silence-collapsed decoder has recon == signal power; demand a
    # decisive margin below it (healthy runs reach ~0.02x).
    assert recon < 0.25 * power, (
        f"recon {recon:.5f} vs signal power {power:.5f}: encoder collapse")
    assert np.isfinite(float(metrics["loss"]))
    # Codes must actually spread over the batch (collapse showed <15%).
    assert float(metrics["codebook_util"]) > 0.15


def test_legacy_gradient_codebook_path():
    """ema_decay=None keeps the original (params, plain_opt_state) API."""
    cfg = tiny_cfg()
    codec = Encodec(SR, SR, model_config=cfg, key=jax.random.PRNGKey(0))
    params = codec.params
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_codec_train_step(cfg, 2, opt, ema_decay=None))
    sig = jnp.asarray(diverse_batch(np.random.default_rng(1), batch=4))
    l0 = None
    for _ in range(10):
        params, opt_state, metrics = step(params, opt_state, sig)
        l0 = float(metrics["loss"]) if l0 is None else l0
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["loss"]) < l0


def test_spec_curriculum_schedule():
    """With spec_delay, the spectral term contributes NOTHING before the
    delay (loss == recon at step 0: commit also warms up from 0) even
    though the spec metric is still reported — the waveform-first
    curriculum that avoids the phase-incoherent msstft optimum."""
    cfg = tiny_cfg()
    codec = Encodec(SR, SR, model_config=cfg, key=jax.random.PRNGKey(0))
    params = codec.params
    opt = optax.adam(1e-3)
    opt_state = init_codec_opt_state(opt, params, num_codebooks=2)
    step = jax.jit(make_codec_train_step(
        cfg, 2, opt, spec_weight=2.0, spec_delay=1000, spec_ramp=100))
    sig = jnp.asarray(diverse_batch(np.random.default_rng(3), batch=4))
    _, _, metrics = step(params, opt_state, sig)
    assert "spec" in metrics and np.isfinite(float(metrics["spec"]))
    assert float(metrics["spec"]) > 0
    np.testing.assert_allclose(float(metrics["loss"]),
                               float(metrics["recon"]), rtol=1e-6)


def test_ema_state_is_jit_carried():
    """The (adam, qstate) tuple round-trips through the jitted step with a
    stable pytree structure (no per-step recompiles)."""
    cfg = tiny_cfg()
    codec = Encodec(SR, SR, model_config=cfg, key=jax.random.PRNGKey(0))
    params = codec.params
    opt = optax.adam(1e-3)
    opt_state = init_codec_opt_state(opt, params, num_codebooks=2)
    step = make_codec_train_step(cfg, 2, opt)
    jitted = jax.jit(step)
    sig = jnp.asarray(diverse_batch(np.random.default_rng(2), batch=4))
    params, opt_state, _ = jitted(params, opt_state, sig)
    s0 = jax.tree_util.tree_structure(opt_state)
    params, opt_state, _ = jitted(params, opt_state, sig)
    assert jax.tree_util.tree_structure(opt_state) == s0
    assert int(opt_state[1]["steps"]) == 2
