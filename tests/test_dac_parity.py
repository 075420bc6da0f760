"""Golden parity: JAX DAC vs the PyTorch HF implementation (random weights)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.dac import convert_dac_state_dict, dac_config_from_hf
from audiocodecs_tpu.models.dac import (
    DAC,
    apply_dac_decoder,
    apply_dac_encoder,
    dac_rvq_decode,
    dac_rvq_encode,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import DacConfig, DacModel

    torch.manual_seed(0)
    cfg = DacConfig(
        encoder_hidden_size=16,
        downsampling_ratios=[4, 5],
        decoder_hidden_size=64,
        upsampling_ratios=[5, 4],
        n_codebooks=4,
        codebook_size=32,
        codebook_dim=4,
        hidden_size=24,
        sampling_rate=16000,
    )
    model = DacModel(cfg).eval()
    with torch.no_grad():  # spread codebooks out (init is tight normal)
        for q in model.quantizer.quantizers:
            q.codebook.weight.mul_(20.0)
    return model, cfg


def test_encoder_feature_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = dac_config_from_hf(hf_cfg)
    params = convert_dac_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 200)).astype(np.float32)
    with torch.no_grad():
        want = model.encoder(torch.from_numpy(x)[:, None, :]).numpy()  # [B,H,N]
    got = np.asarray(
        apply_dac_encoder(params["encoder"], jnp.asarray(x)[:, :, None], cfg)
    )
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5, rtol=1e-4)


def test_token_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = dac_config_from_hf(hf_cfg)
    params = convert_dac_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 200)).astype(np.float32)
    with torch.no_grad():
        out = model.encode(torch.from_numpy(x)[:, None, :], n_quantizers=3)
        want = out.audio_codes.numpy().transpose(0, 2, 1)  # [B, N, K]
    feats = apply_dac_encoder(params["encoder"], jnp.asarray(x)[:, :, None], cfg)
    got = np.asarray(dac_rvq_encode(feats, params["quantizer"], 3))
    assert got.shape == want.shape
    assert (got == want).mean() == 1.0


def test_decoder_waveform_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = dac_config_from_hf(hf_cfg)
    params = convert_dac_state_dict(model.state_dict(), cfg)
    toks = rng.integers(0, hf_cfg.codebook_size, size=(2, 9, 4)).astype(np.int32)
    with torch.no_grad():
        q = model.quantizer.from_codes(torch.from_numpy(toks).long().movedim(-1, -2))[0]
        want = model.decoder(q).numpy()[:, 0]
    qj = dac_rvq_decode(jnp.asarray(toks), params["quantizer"])
    got = np.asarray(apply_dac_decoder(params["decoder"], qj, cfg))[:, :, 0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_codec_api(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = dac_config_from_hf(hf_cfg)
    params = convert_dac_state_dict(model.state_dict(), cfg)
    codec = DAC(16000, 16000, num_codebooks=2, model_config=cfg, params=params)
    sig = rng.standard_normal((1, 400)).astype(np.float32)
    toks = codec.sig_to_toks(jnp.asarray(sig))
    assert toks.shape[-1] == 2
    rec = codec.toks_to_sig(toks)
    assert rec.ndim == 2
    assert codec.embs().shape == (2, hf_cfg.codebook_size, hf_cfg.hidden_size)
    lat = DAC(16000, 16000, num_codebooks=2, latent=True, model_config=cfg,
              params=params)
    assert lat.embs().shape == (2, hf_cfg.codebook_size, hf_cfg.codebook_dim)
