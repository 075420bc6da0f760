"""Structural self-tests for codec families without an offline torch oracle
(SpeechTokenizer, WavTokenizer, EnCodec+Vocos) — the reference's per-codec
__main__ smoke tests (SURVEY §4.1), upgraded to assertions: all three modes,
shape contracts, embs(), mode pruning, VQ determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig
from audiocodecs_tpu.models.speechtokenizer import (
    SpeechTokenizer,
    SpeechTokenizerModelConfig,
)
from audiocodecs_tpu.models.wavtokenizer import (
    WavTokenizer,
    WavTokenizerModelConfig,
)
from audiocodecs_tpu.nn.vocos import VocosConfig

ST_CFG = SpeechTokenizerModelConfig(
    num_filters=8, hidden_size=32, upsampling_ratios=(4, 2),
    codebook_size=32, codebook_dim=32, num_quantizers=4,
)
WT_CFG = WavTokenizerModelConfig(
    num_filters=8, hidden_size=32, upsampling_ratios=(4, 2),
    codebook_size=64, codebook_dim=32, vocos_dim=32,
    vocos_intermediate_dim=64, vocos_layers=2, n_fft=64, hop_length=8,
)


def test_speechtokenizer_contract(rng):
    c = SpeechTokenizer(16000, 16000, num_codebooks=3, model_config=ST_CFG)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape == (2, 50, 3)
    assert c.toks_to_sig(toks).shape == (2, 400)
    assert c.embs().shape == (3, 32, 32)
    assert c.sig_to_feats(sig).shape == (2, 50, 32)
    # determinism
    toks2 = c.sig_to_toks(sig)
    assert (np.asarray(toks) == np.asarray(toks2)).all()
    # qfeats == rvq_decode(toks)
    qf = c.toks_to_qfeats(toks)
    assert qf.shape == (2, 50, 32)


def test_speechtokenizer_mode_pruning():
    enc = SpeechTokenizer(16000, 16000, mode="encode", model_config=ST_CFG)
    assert "decoder" not in enc.params
    dec = SpeechTokenizer(16000, 16000, mode="decode", model_config=ST_CFG)
    assert "encoder" not in dec.params


def test_bilstm_doubles_channels(rng):
    from audiocodecs_tpu.nn.lstm import bilstm, init_bilstm_params

    p = init_bilstm_params(jax.random.PRNGKey(0), 2, 16, 16)
    x = jnp.asarray(rng.standard_normal((2, 9, 16)).astype(np.float32))
    y = bilstm(x, p)
    assert y.shape == (2, 9, 32)
    # backward half of layer-1 output at t depends on future inputs
    x2 = x.at[:, -1].set(0.0)
    y2 = bilstm(x2, p)
    assert not np.allclose(np.asarray(y[:, 0, 16:]), np.asarray(y2[:, 0, 16:]))


def test_wavtokenizer_contract(rng):
    c = WavTokenizer(24000, 24000, model_config=WT_CFG)
    sig = jnp.asarray(rng.standard_normal((2, 400)).astype(np.float32))
    toks = c.sig_to_toks(sig)
    assert toks.shape[-1] == 1
    rec = c.toks_to_sig(toks)
    assert rec.ndim == 2 and rec.shape[0] == 2
    assert c.embs().shape == (1, 64, 32)
    with pytest.raises(ValueError, match="single-codebook"):
        WavTokenizer(24000, 24000, num_codebooks=2, model_config=WT_CFG)


def test_encodec_vocos_path(rng):
    ec_cfg = EncodecModelConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=32, codebook_dim=16,
        num_quantizers=8,
    )
    vc = VocosConfig(input_channels=16, dim=32, intermediate_dim=64,
                     num_layers=2, n_fft=32, hop_length=8)
    ec = Encodec(800, 800, num_codebooks=8, use_vocos=True, vocos_config=vc,
                 model_config=ec_cfg)
    assert "decoder" not in ec.params and "vocos" in ec.params
    sig = jnp.asarray(rng.standard_normal((1, 160)).astype(np.float32))
    rec = ec.toks_to_sig(ec.sig_to_toks(sig))
    assert rec.ndim == 2
    with pytest.raises(ValueError, match="num_codebooks"):
        Encodec(800, 800, num_codebooks=3, use_vocos=True, vocos_config=vc,
                model_config=ec_cfg)


def test_istft_roundtrip(rng):
    """ISTFT inverts an STFT built with the same centered Hann framing."""
    from audiocodecs_tpu.nn.vocos import istft

    n_fft, hop = 64, 16
    T = 640
    x = rng.standard_normal(T).astype(np.float32)[None]
    window = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    xp = np.pad(x, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = 1 + (xp.shape[1] - n_fft) // hop
    frames = np.stack(
        [xp[0, i * hop : i * hop + n_fft] * window for i in range(n_frames)]
    )
    spec = np.fft.rfft(frames, axis=-1)
    y = np.asarray(
        istft(jnp.asarray(spec.real.astype(np.float32))[None],
              jnp.asarray(spec.imag.astype(np.float32))[None], n_fft, hop)
    )[0]
    n = min(len(y), T)
    np.testing.assert_allclose(y[hop:n - hop], x[0, hop:n - hop], atol=1e-4)
