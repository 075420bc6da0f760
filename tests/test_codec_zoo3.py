"""Structural self-tests: FocalCodec (BSQ) and BiCodec (global+semantic)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.models.bicodec import (
    BiCodec,
    BiCodecModelConfig,
    NUM_GLOBAL_TOKENS,
)
from audiocodecs_tpu.models.focalcodec import (
    FocalCodec,
    FocalCodecModelConfig,
    bsq_decode,
    bsq_encode,
)
from audiocodecs_tpu.nn.focalnet import FocalConfig
from audiocodecs_tpu.nn.wavlm import WavLMConfig

TINY_WAVLM = WavLMConfig(
    hidden_size=32, num_layers=3, num_heads=4, intermediate_size=64,
    conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
    num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
    num_buckets=32, max_distance=50,
)

# XLSR-style plain-attention tower (BiCodec's feature extractor)
TINY_WAVLM_XLSR = dataclasses.replace(
    TINY_WAVLM, gated_rel_pos=False, do_stable_layer_norm=True,
    feat_extract_norm="layer", conv_bias=True,
)


def test_bsq_exact_roundtrip():
    codes = jnp.arange(2**6)
    assert (bsq_encode(bsq_decode(codes, 6)) == codes).all()
    # lattice points are unit-norm
    pts = bsq_decode(codes, 6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(pts), axis=-1), 1.0,
                               atol=1e-6)


def test_focalcodec_contract(rng):
    cfg = FocalCodecModelConfig(
        codebook_bits=6, wavlm=TINY_WAVLM, wavlm_layer=2,
        compressor_blocks=2, vocos_dim=8, vocos_intermediate_dim=16,
        vocos_layers=2, n_fft=32, hop_length=8,
    )
    c = FocalCodec(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 800)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape[-1] == 1 and int(jnp.max(toks)) < 64
    rec = c.toks_to_sig(toks)
    assert rec.shape[0] == 2
    assert c.embs().shape == (1, 64, 6)
    # default encoder follows the WavLM-large lineage (pre-norm)
    assert FocalCodecModelConfig().wavlm.do_stable_layer_norm
    enc = FocalCodec(16000, 16000, mode="encode", model_config=cfg,
                     params=dict(c.params))
    assert "decoder" not in enc.params and "decompressor" not in enc.params


def _tiny_bicodec_cfg():
    return BiCodecModelConfig(
        w2v=TINY_WAVLM_XLSR, feat_layers=(1, 2),
        encoder_dim=8, encoder_intermediate_dim=16, encoder_layers=2,
        latent_dim=16, codebook_size=64, codebook_dim=8,
        num_mels=20, n_fft=64, win_length=40, hop_length=20,
        speaker_channels=16, speaker_dim=16, perceiver_dim=8,
        perceiver_depth=1, fsq_levels=(4, 4, 4),
        prenet_dim=8, prenet_intermediate_dim=16, prenet_layers=2,
        decoder_channels=16, decoder_rates=(4, 5), decoder_kernels=(8, 10),
    )


def test_bicodec_global_semantic_stream(rng):
    cfg = _tiny_bicodec_cfg()
    c = BiCodec(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    # 32 global tokens + semantic frames (wav2vec2 grid: hop 20 here)
    n_sem = toks.shape[1] - NUM_GLOBAL_TOKENS
    assert n_sem > 0 and toks.shape[-1] == 1
    # global ids live on the FSQ sub-vocabulary
    assert int(jnp.max(toks[:, :NUM_GLOBAL_TOKENS])) < 64
    rec = c.toks_to_sig(toks)
    assert rec.shape[0] == 2 and rec.shape[1] == n_sem * 20
    # swapping global tokens (≙ a different speaker) changes the output
    # while semantic tokens stay fixed
    mixed = toks.at[:, :NUM_GLOBAL_TOKENS].set(
        (toks[:, :NUM_GLOBAL_TOKENS] + 7) % 64)
    rec2 = c.toks_to_sig(mixed)
    assert not np.allclose(np.asarray(rec), np.asarray(rec2))
    assert c.embs().shape == (1, 64, 8)
    # combined qfeats = dequantized semantic ‖ broadcast d-vector
    qf = c.toks_to_qfeats(toks)
    assert qf.shape == (2, n_sem, 2 * cfg.latent_dim)
    # mode pruning mirrors the reference (bicodec.py:51-57)
    dec = BiCodec(16000, 16000, mode="decode", model_config=cfg,
                  params=dict(c.params))
    assert "w2v" not in dec.params and "ecapa" not in dec.params
