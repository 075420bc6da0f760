"""Structural self-tests for the SEANet-RVQ / single-VQ / FSQ codec families
(PAST, AudioDec, HILCodec, BigCodec, MagiCodec, NanoCodec, StableCodec)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.models import available_codecs, get_codec_class
from audiocodecs_tpu.models.nanocodec import NanoCodec, NanoCodecModelConfig
from audiocodecs_tpu.models.stablecodec import StableCodec
from audiocodecs_tpu.models.seanet_rvq import SEANetRVQConfig
from audiocodecs_tpu.models.magicodec import MagiCodecModelConfig


def tiny(cfg):
    return dataclasses.replace(
        cfg, num_filters=4,
        hidden_size=16 if hasattr(cfg, "hidden_size") else None,
        upsampling_ratios=(4, 2),
    )


@pytest.mark.parametrize("name", ["past"])
def test_seanet_rvq_families(rng, name):
    cls = get_codec_class(name)
    base = cls.default_model_config()
    cfg = dataclasses.replace(
        base, num_filters=4, hidden_size=16, upsampling_ratios=(4, 2),
        codebook_size=32,
        codebook_dim=min(base.codebook_dim, 16) if base.codebook_dim != base.hidden_size else 16,
        num_quantizers=4,
    )
    c = cls(base.sampling_rate, base.sampling_rate, num_codebooks=3,
            model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 50, 3)
    assert c.toks_to_sig(toks).shape[0] == 2
    assert c.embs().shape[0] == 3
    assert (np.asarray(toks) == np.asarray(c.sig_to_toks(sig))).all()


def test_hilcodec_vendor_structure(rng):
    """Paper-reconstructed HILCodec (arXiv:2405.04752): variance-scaled
    depthwise-separable res units, waveform skips, hop 320 @ 24 kHz."""
    from audiocodecs_tpu.models.hilcodec import (
        HILCodec,
        HILCodecModelConfig,
    )

    base = HILCodec.default_model_config()
    assert base.hop_length == 320 and base.emb_dim == 128
    assert base.widths == (32, 64, 128, 256)
    cfg = HILCodecModelConfig(
        sampling_rate=800, channels=4, max_channels=16, strides=(4, 2),
        emb_dim=8, codebook_size=32, num_quantizers=4)
    c = HILCodec(800, 800, num_codebooks=3, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 50, 3)
    rec = c.toks_to_sig(toks)
    assert rec.shape == (2, 400)
    assert c.embs().shape == (3, 32, 8)
    # variance constraint: residual scaling keeps activations bounded
    big = jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32)) * 10
    feats = c._sig_to_feats(c.params, big, None)
    assert bool(jnp.isfinite(feats).all())


def test_audiodec_vendor_structure(rng):
    from audiocodecs_tpu.models.audiodec import AudioDec, AudioDecModelConfig

    base = AudioDec.default_model_config()
    assert base.hop_length == 300 and base.code_dim == 64
    assert base.widths == (64, 128, 256, 512)
    cfg = AudioDecModelConfig(
        sampling_rate=1200, encode_channels=4, channel_ratios=(2, 4),
        strides=(3, 4), code_dim=8, codebook_size=32, num_quantizers=4,
    )
    c = AudioDec(1200, 1200, num_codebooks=2, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 240)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 20, 2)  # hop 12, truncated RVQ
    assert c.toks_to_sig(toks).shape == (2, 240)
    assert c.embs().shape == (2, 32, 8)
    assert c.sig_to_feats(sig).shape == (2, 20, 8)  # projector output


def test_single_vq_families(rng):
    cls = get_codec_class("magicodec")
    base = cls.default_model_config()
    assert base.codebook_size == 131072 and base.codebook_dim == 16
    assert base.hop_length == 320  # 50 Hz transformer codec
    cfg = MagiCodecModelConfig(
        sampling_rate=16000, hop_length=8, dim=16, depth=2, num_heads=2,
        codebook_size=64, codebook_dim=8,
    )
    c = cls(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 50, 1)
    assert c.toks_to_sig(toks).shape == (2, 400)
    assert c.embs().shape == (1, 64, 16)  # post-projection
    lat = cls(16000, 16000, latent=True, model_config=cfg, params=c.params)
    assert lat.embs().shape == (1, 64, 8)


def test_bigcodec_true_architecture(rng):
    """DAC-lineage BigCodec: hop 200 (2·2·2·5·5), encoder LSTM bottleneck,
    single factorized cosine VQ behind 1024↔8 projections
    (reference bigcodec.py:56-68)."""
    from audiocodecs_tpu.models.bigcodec import BigCodec, BigCodecModelConfig

    base = BigCodec.default_model_config()
    assert base.hop_length == 200 and base.codebook_size == 8192
    assert base.codebook_dim == 8 and base.hidden_size == 1024

    cfg = BigCodecModelConfig(ngf=4, up_ratios=(2, 5), dilations=(1, 3),
                              hidden_size=16, codebook_size=64,
                              codebook_dim=8, rnn_layers=1)
    c = BigCodec(16000, 16000, model_config=cfg)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 40, 1)  # hop 10
    rec = c.toks_to_sig(toks)
    assert rec.shape == (2, 400)
    assert bool(jnp.isfinite(rec).all())
    assert c.embs().shape == (1, 64, 8)  # latent=True default (ref :41)
    full = BigCodec(16000, 16000, latent=False, model_config=cfg,
                    params=c.params)
    assert full.embs().shape == (1, 64, 16)
    # qfeats == dequantized tokens
    q = c.toks_to_qfeats(toks)
    assert q.shape == (2, 40, 16)


def test_nanocodec_fsq(rng):
    cfg = NanoCodecModelConfig(
        sampling_rate=800, base_channels=4, down_sample_rates=(4, 2),
        resblock_kernels=(3, 5), resblock_dilations=(1, 3),
        levels=(5, 5, 5), num_groups=4,
    )
    c = NanoCodec(800, 800, model_config=cfg)
    assert c.config.vocab_size == 125
    sig = jnp.asarray(rng.standard_normal((2, 160)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 20, 4)
    assert int(jnp.max(toks)) < 125 and int(jnp.min(toks)) >= 0
    assert c.toks_to_sig(toks).shape == (2, 160)
    assert c.embs().shape == (4, 125, 3)
    # grouped FSQ dequantization keeps the per-group slice layout
    q = c.toks_to_qfeats(toks)
    assert q.shape == (2, 20, 12)
    # pre-quantizer features carry the encoded dim
    assert c.sig_to_feats(sig).shape == (2, 20, 12)


def test_stablecodec_residual_fsq(rng):
    cfg = dataclasses.replace(
        StableCodec.default_model_config(bottleneck=(4, 729)),
        patch=8, dim=16, depth_outer=1, depth_inner=1, num_heads=2,
    )
    c = StableCodec(16000, 16000, model_config=cfg, num_codebooks=2)
    assert c.config.vocab_size == 729
    sig = jnp.asarray(rng.standard_normal((1, 320)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (1, 320 // 16, 2)  # 2× pooled patch grid
    rec = c.toks_to_sig(toks)
    assert rec.shape == (1, 320)
    assert c.embs().shape == (2, 729, 6)
    # second residual stage rides at the documented smaller scale
    e = np.asarray(c.embs())
    assert np.isclose(np.abs(e[1]).max(), 0.5 * np.abs(e[0]).max())
    # pre-bottleneck latents are the 6-d continuous features
    assert c.sig_to_feats(sig).shape == (1, 20, 6)
    with pytest.raises(ValueError, match="bottleneck"):
        StableCodec.default_model_config(bottleneck=(1, 1000))


def test_registry_complete():
    names = available_codecs()
    for required in ("encodec", "dac", "mimi", "speechtokenizer",
                     "wavtokenizer", "past", "audiodec", "hilcodec",
                     "bigcodec", "magicodec", "nanocodec", "stablecodec"):
        assert required in names
