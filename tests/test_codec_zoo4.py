"""Structural self-tests: XCodec2, DyCAST, SemantiCodec."""

import numpy as np
import pytest

import jax.numpy as jnp

from audiocodecs_tpu.models.dycast import DyCAST, DyCASTModelConfig
from audiocodecs_tpu.models.semanticodec import (
    SemantiCodec,
    SemantiCodecModelConfig,
)
from audiocodecs_tpu.models.xcodec2 import XCodec2, XCodec2ModelConfig
from audiocodecs_tpu.nn.wavlm import WavLMConfig

TINY_WAVLM = WavLMConfig(
    hidden_size=32, num_layers=3, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    num_buckets=32, max_distance=50,
)


def test_xcodec2_contract(rng):
    from audiocodecs_tpu.nn.w2vbert import W2VBertConfig

    cfg = XCodec2ModelConfig(
        ngf=4, acoustic_dim=16, semantic_dim=16, fused_dim=32,
        w2vbert=W2VBertConfig(hidden_size=16, num_layers=2, num_heads=2,
                              intermediate_size=32, conv_kernel=5),
        semantic_layer=2, backbone_depth=2, backbone_heads=2,
    )
    c = XCodec2(16000, 16000, model_config=cfg)
    assert c.config.vocab_size == 65536
    sig = jnp.asarray(rng.standard_normal((2, 1600)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 5, 1) and int(jnp.max(toks)) < 65536
    rec = c.toks_to_sig(toks)
    assert rec.shape == (2, 1600)
    assert c.embs().shape == (1, 65536, 8)
    # decode-mode pruning drops both encoder branches
    dec = XCodec2(16000, 16000, mode="decode", model_config=cfg,
                  params=dict(c.params))
    assert "w2vbert" not in dec.params and "encoder" not in dec.params


def test_dycast_variable_segments(rng):
    cfg = DyCASTModelConfig(
        num_channels=8, max_segments=16, max_duration=8, wavlm=TINY_WAVLM,
        wavlm_layer=2, vocoder_filters=4, vocoder_ratios=(5, 2, 2),
    )
    c = DyCAST(16000, 16000, model_config=cfg)
    assert c.config.num_codebooks == 9  # 8 channels + duration
    sig = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 16, 9)
    # channel tokens in {0..3}; duration channel within cap
    assert int(jnp.max(toks[..., :8])) < 4
    assert int(jnp.max(toks[..., 8])) < 8
    rec = c.toks_to_sig(toks)
    assert rec.shape[0] == 2
    # duration channel drives output expansion
    embs = c.embs()
    assert embs.shape[0] == 9
    with pytest.raises(ValueError, match="num_codebooks"):
        DyCAST(16000, 16000, num_codebooks=4, model_config=cfg)


def test_dycast_retriever(rng):
    """kNN feature retriever (reference dycast.py:49-52,215-221): bank hit
    above the similarity threshold replaces the feature; below leaves it."""
    import dataclasses

    import jax

    cfg = DyCASTModelConfig(
        num_channels=8, max_segments=16, max_duration=8, wavlm=TINY_WAVLM,
        wavlm_layer=2, vocoder_filters=4, vocoder_ratios=(5, 2, 2),
        use_retriever=True, sim_threshold=0.97, blend=1.0,
        retriever_bank_size=32,
    )
    c = DyCAST(16000, 16000, model_config=cfg)
    assert "retriever_bank" in c.params
    # encode mode prunes the bank (reference dycast.py:110)
    enc = DyCAST(16000, 16000, mode="encode", model_config=cfg,
                 params=dict(c.params))
    assert "retriever_bank" not in enc.params

    bank = np.asarray(c.params["retriever_bank"])
    # feature 0 = scaled bank[3] (cos sim 1 → replaced by bank[3] exactly
    # at blend=1); feature 1 = orthogonal-ish random (below threshold →
    # passes through)
    f0 = 2.5 * bank[3]
    f1 = rng.standard_normal(bank.shape[1]).astype(np.float32) * 100.0
    feats = jnp.asarray(np.stack([f0, f1])[None])  # [1, 2, H]
    out = np.asarray(c._retrieve(c.params, feats))[0]
    np.testing.assert_allclose(out[0], bank[3], rtol=1e-5)
    sims = (f1 / np.linalg.norm(f1)) @ (
        bank / np.linalg.norm(bank, axis=-1, keepdims=True)).T
    if sims.max() < 0.97:  # overwhelmingly true for random vectors
        np.testing.assert_allclose(out[1], f1, rtol=1e-6)
    # full roundtrip through the retriever-enabled decoder
    sig = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32))
    rec = c.toks_to_sig(c.sig_to_toks(sig))
    assert rec.shape[0] == 2 and bool(jnp.isfinite(rec).all())


def test_semanticodec_contract(rng):
    cfg = SemantiCodecModelConfig(
        mel_bins=16, window_frames=32, patch_size=4, vit_hidden=16,
        vit_layers=1, vit_heads=2, stack_factor=2, semantic_vocab=32,
        acoustic_vocab=16, denoiser_hidden=16, denoiser_layers=1,
        denoiser_heads=2, ddim_steps=2, decoder_variant="analog",
    )
    assert cfg.patches_per_window == 32 and cfg.tokens_per_window == 16
    assert cfg.feature_dim == 32  # vit_hidden × stack_factor
    c = SemantiCodec(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 8000)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape[-1] == 2  # semantic + acoustic
    # vendor trim arithmetic (reference semanticodec.py:145-179): tokens
    # reflect the ORIGINAL duration, not the 10.24 s-window padding:
    # 0.5 s / (patch 4 × 10 ms) → 13 cols × 4 freq patches / sf 2 = 26
    assert toks.shape[1] == 26
    assert int(jnp.max(toks[..., 0])) < 32
    assert int(jnp.max(toks[..., 1])) < 16
    rec = c.toks_to_sig(toks)
    assert rec.shape[0] == 2
    assert c.embs().shape == (2, 32, 32)
    # DDIM decode is deterministic given tokens (fixed sampler key)
    rec2 = c.toks_to_sig(toks)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=1e-6)


def test_full_zoo_registry():
    from audiocodecs_tpu.models import available_codecs

    # every reference wrapper family has an implementation
    expected = {
        "encodec", "dac", "mimi", "speechtokenizer", "wavtokenizer", "past",
        "audiodec", "hilcodec", "bigcodec", "magicodec", "nanocodec",
        "stablecodec", "wavlm_kmeans", "focalcodec", "bicodec", "xcodec2",
        "dycast", "semanticodec",
    }
    assert expected.issubset(set(available_codecs()))


def test_semanticodec_reference_kwargs(rng):
    """Reference-constructor kwargs (semanticodec.py:37-44) map onto the
    model config: token_rate→stack_factor, vocab/ddim/cfg passthrough."""
    base = SemantiCodecModelConfig(
        mel_bins=16, window_frames=32, patch_size=4, vit_hidden=16,
        vit_layers=1, vit_heads=2, semantic_vocab=32, acoustic_vocab=16,
        denoiser_hidden=16, denoiser_layers=1, denoiser_heads=2,
        ddim_steps=2, decoder_variant="analog")
    c = SemantiCodec(16000, 16000, model_config=base, token_rate=25,
                     semantic_vocab_size=64, ddim_sample_step=3,
                     cfg_scale=1.5)
    mc = c.model_config
    assert mc.stack_factor == 4 and mc.semantic_vocab == 64
    assert mc.ddim_steps == 3 and mc.cfg_scale == 1.5
    assert c.config.vocab_sizes == (64, 16)
    toks = c.sig_to_toks(jnp.asarray(
        rng.standard_normal((1, 4000)).astype(np.float32)))
    assert toks.shape[-1] == 2
    with pytest.raises(ValueError, match="token_rate"):
        SemantiCodec(16000, 16000, model_config=base, token_rate=33)


def test_dycast_channel_tokens_carry_information(rng):
    """Regression (review finding): the level-2 FSQ lattice is {−1, 0}, so
    the encode-side bit test must be `codes >= 0` — with `codes > 0` every
    channel token collapsed to 0. Tokens must vary across utterances and
    the encode→decode bit mapping must invert on the lattice."""
    cfg = DyCASTModelConfig(
        num_channels=8, max_segments=16, max_duration=8, wavlm=TINY_WAVLM,
        wavlm_layer=2, vocoder_filters=4, vocoder_ratios=(5, 2, 2),
    )
    c = DyCAST(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((4, 800)).astype(np.float32))
    toks = np.asarray(c.sig_to_toks(sig))
    chan = toks[..., :8]
    assert len(np.unique(chan)) > 1, "channel tokens are constant"
    # bit mapping roundtrip on the {−1, 0} lattice: tok -> codes -> tok
    for tok in range(4):
        b0, b1 = (tok % 2) - 1.0, (tok // 2) - 1.0
        back = int(b0 >= 0) + 2 * int(b1 >= 0)
        assert back == tok, (tok, back)
