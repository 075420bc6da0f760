"""Full-default-config parity: released architecture sizes, random weights.

The toy-scale parity tests validate converter math and layouts; these
validate full-scale numerics — argmin stability at 1024/2048-entry
codebooks, deep residual stacks, real strides — using the *released*
architectures (transformers' default ``EncodecConfig``/``DacConfig``/
``MimiConfig`` equal facebook/encodec_24khz, descript/dac (44k ratios),
kyutai/mimi; reference loads the released weights at
``/root/reference/audiocodecs/encodec.py:49-51``, ``dac.py:55-57``,
``mimi.py:45``). Weights are random (no network in this environment), so
this checks architecture + converter at scale, not the checkpoint values.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.dac import convert_dac_state_dict, dac_config_from_hf
from audiocodecs_tpu.convert.encodec import (
    convert_encodec_state_dict,
    encodec_config_from_hf,
)
from audiocodecs_tpu.convert.mimi import convert_mimi_state_dict, mimi_config_from_hf
from audiocodecs_tpu.models.dac import apply_dac_encoder, dac_rvq_encode
from audiocodecs_tpu.models.encodec import Encodec
from audiocodecs_tpu.models.mimi import _encode_tower, _split_rvq_encode
from audiocodecs_tpu.nn.seanet import apply_decoder, apply_encoder
from audiocodecs_tpu.quant.rvq import rvq_decode, rvq_encode


def test_encodec_24khz_default_config_token_parity(rng):
    """facebook/encodec_24khz architecture: hop 320, 32-stage RVQ @1024."""
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    hf_cfg = EncodecConfig()  # == facebook/encodec_24khz architecture
    assert hf_cfg.num_quantizers == 32 and hf_cfg.codebook_size == 1024
    model = EncodecModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()

    cfg = encodec_config_from_hf(hf_cfg)
    params = convert_encodec_state_dict(model.state_dict(), cfg)

    x = (rng.standard_normal((1, 12000)) * 0.3).astype(np.float32)  # 0.5 s
    K = 8
    with torch.no_grad():
        out = model.encode(torch.from_numpy(x)[:, None, :], bandwidth=6.0)
        want = out.audio_codes[0].numpy().transpose(0, 2, 1)  # [B, N, K]
    feats = apply_encoder(params["encoder"], jnp.asarray(x)[:, :, None],
                          cfg.seanet())
    got = np.asarray(rvq_encode(feats, jnp.asarray(params["codebooks"]), K))
    assert got.shape == want.shape == (1, 38, 8)
    assert (got == want).mean() == 1.0

    # Decoder waveform parity at full depth (hop-320 transposed conv chain).
    with torch.no_grad():
        dec = model.decode(out.audio_codes, [None]).audio_values[:, 0].numpy()
    qj = rvq_decode(jnp.asarray(got), jnp.asarray(params["codebooks"]))
    got_sig = np.asarray(apply_decoder(params["decoder"], qj,
                                       cfg.seanet()))[:, :, 0]
    assert got_sig.shape == dec.shape
    scale = np.abs(dec).max()
    np.testing.assert_allclose(got_sig, dec, atol=2e-4 * scale, rtol=1e-3)


def test_dac_default_config_token_parity(rng):
    """descript/dac architecture: hop 512, 9 codebooks @1024, proj dim 8."""
    from transformers import DacConfig, DacModel

    torch.manual_seed(0)
    hf_cfg = DacConfig()  # released DAC dims (hop 512, decoder 1536)
    assert hf_cfg.n_codebooks == 9 and hf_cfg.codebook_size == 1024
    model = DacModel(hf_cfg).eval()
    with torch.no_grad():
        for q in model.quantizer.quantizers:
            q.codebook.weight.mul_(20.0)

    cfg = dac_config_from_hf(hf_cfg)
    params = convert_dac_state_dict(model.state_dict(), cfg)

    x = (rng.standard_normal((1, 8192)) * 0.3).astype(np.float32)
    with torch.no_grad():
        out = model.encode(torch.from_numpy(x)[:, None, :], n_quantizers=9)
        want = out.audio_codes.numpy().transpose(0, 2, 1)  # [B, N, K]
    feats = apply_dac_encoder(params["encoder"], jnp.asarray(x)[:, :, None],
                              cfg)
    got = np.asarray(dac_rvq_encode(feats, params["quantizer"], 9))
    assert got.shape == want.shape == (1, 16, 9)
    assert (got == want).mean() == 1.0


def test_mimi_default_config_token_parity(rng):
    """kyutai/mimi architecture: 8-layer transformer towers, 12.5 Hz,
    split semantic/acoustic RVQ @2048."""
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    hf_cfg = MimiConfig()  # == kyutai/mimi architecture
    assert hf_cfg.codebook_size == 2048 and hf_cfg.num_quantizers == 32
    model = MimiModel(hf_cfg).eval()
    with torch.no_grad():
        for rvq in (model.quantizer.semantic_residual_vector_quantizer,
                    model.quantizer.acoustic_residual_vector_quantizer):
            for layer in rvq.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.fill_(1.0)

    cfg = mimi_config_from_hf(hf_cfg)
    params = convert_mimi_state_dict(model.state_dict(), cfg)

    x = (rng.standard_normal((1, 12000)) * 0.3).astype(np.float32)  # 0.5 s
    K = 8
    with torch.no_grad():
        want = model.encode(torch.from_numpy(x)[:, None, :],
                            num_quantizers=K).audio_codes.numpy()  # [B, K, N]
    got = np.asarray(
        _split_rvq_encode(params["quantizer"],
                          _encode_tower(params, jnp.asarray(x), cfg),
                          K, cfg.num_semantic_quantizers)
    ).transpose(0, 2, 1)
    assert got.shape == want.shape
    assert (got == want).mean() == 1.0


def test_encodec_48khz_default_config_token_parity(rng):
    """facebook/encodec_48khz architecture knobs: normalize + 1 s chunking.

    Uses the 24 kHz backbone dims (channels=1: our contract is mono [B,T])
    with the 48 kHz model's normalize/chunking configuration
    (reference ``audiocodecs/encodec.py:49-66``)."""
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(1)
    hf_cfg = EncodecConfig(normalize=True, chunk_length_s=0.1, overlap=0.0,
                           use_causal_conv=False, pad_mode="reflect")
    model = EncodecModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()
    cfg = encodec_config_from_hf(hf_cfg)
    assert cfg.chunk_length == 2400 and cfg.normalize
    params = convert_encodec_state_dict(model.state_dict(), cfg)
    codec = Encodec(24000, 24000, num_codebooks=8, model_config=cfg,
                    params=params)
    x = (rng.standard_normal((1, 7200)) * 0.5).astype(np.float32)
    with torch.no_grad():
        out = model.encode(torch.from_numpy(x)[:, None, :], bandwidth=6.0)
        want = (out.audio_codes.numpy().transpose(1, 0, 3, 2)
                .reshape(1, -1, 8))
    got = np.asarray(codec.sig_to_toks(jnp.asarray(x)))
    assert got.shape == want.shape
    assert (got == want).mean() == 1.0
