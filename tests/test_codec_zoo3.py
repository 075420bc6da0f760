"""Structural self-tests: FocalCodec (BSQ) and BiCodec (global+semantic)."""

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


def test_bicodec_global_semantic_stream(rng):
    cfg = BiCodecModelConfig(
        num_filters=4, hidden_size=16, upsampling_ratios=(4, 2),
        codebook_size=64, codebook_dim=8,
    )
    c = BiCodec(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    # 32 global tokens + 50 semantic frames
    assert toks.shape == (2, NUM_GLOBAL_TOKENS + 50, 1)
    rec = c.toks_to_sig(toks)
    assert rec.shape == (2, 400)
    # swapping global tokens changes output; semantic kept
    other = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks2 = c.sig_to_toks(other)
    mixed = toks.at[:, :NUM_GLOBAL_TOKENS].set(toks2[:, :NUM_GLOBAL_TOKENS])
    rec2 = c.toks_to_sig(mixed)
    assert not np.allclose(np.asarray(rec), np.asarray(rec2))
    assert c.embs().shape == (1, 64, 8)
