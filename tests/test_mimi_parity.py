"""Golden parity: JAX Mimi vs the PyTorch HF implementation (random weights).

Covers the full tower: causal SEANet (no LSTM) → transformer (RoPE,
LayerScale, sliding window) → downsample → split RVQ → upsample (grouped
transposed conv) → decoder transformer → SEANet decoder.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.mimi import convert_mimi_state_dict, mimi_config_from_hf
from audiocodecs_tpu.models.mimi import (
    Mimi,
    _decode_tower,
    _encode_tower,
    _split_rvq_decode,
    _split_rvq_encode,
)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import MimiConfig, MimiModel

    torch.manual_seed(0)
    cfg = MimiConfig(
        sampling_rate=512,
        audio_channels=1,
        num_filters=8,
        hidden_size=32,
        upsampling_ratios=[4, 2],
        kernel_size=7,
        last_kernel_size=3,
        residual_kernel_size=3,
        num_residual_layers=1,
        dilation_growth_rate=2,
        use_causal_conv=True,
        pad_mode="constant",
        compress=2,
        trim_right_ratio=1.0,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=64,
        norm_eps=1e-5,
        rope_theta=10000.0,
        sliding_window=5,
        layer_scale_initial_scale=0.01,
        codebook_size=32,
        codebook_dim=16,
        num_quantizers=4,
        num_semantic_quantizers=1,
        vector_quantization_hidden_dimension=16,
        upsample_groups=32,
        frame_rate=32.0,  # encodec frame rate = 512/8 = 64 -> downsample stride 2
        use_streaming=False,
    )
    model = MimiModel(cfg).eval()
    with torch.no_grad():
        for rvq in (model.quantizer.semantic_residual_vector_quantizer,
                    model.quantizer.acoustic_residual_vector_quantizer):
            for layer in rvq.layers:
                layer.codebook.embed_sum.normal_()
                layer.codebook.cluster_usage.fill_(1.0)
    return model, cfg


def _params(model, cfg):
    return convert_mimi_state_dict(model.state_dict(), mimi_config_from_hf(cfg))


def test_encode_tower_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = mimi_config_from_hf(hf_cfg)
    params = _params(model, hf_cfg)
    x = rng.standard_normal((2, 100)).astype(np.float32)
    with torch.no_grad():
        emb = model.encoder(torch.from_numpy(x)[:, None, :])
        emb = model.encoder_transformer(emb.transpose(1, 2))[0].transpose(1, 2)
        want = model.downsample(emb).numpy()  # [B, H, N]
    got = np.asarray(_encode_tower(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=3e-4, rtol=3e-3)


def test_token_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = mimi_config_from_hf(hf_cfg)
    params = _params(model, hf_cfg)
    x = rng.standard_normal((2, 100)).astype(np.float32)
    with torch.no_grad():
        want = model.encode(torch.from_numpy(x)[:, None, :],
                            num_quantizers=3).audio_codes.numpy()  # [B, K, N]
    got = np.asarray(
        _split_rvq_encode(params["quantizer"],
                          _encode_tower(params, jnp.asarray(x), cfg),
                          3, cfg.num_semantic_quantizers)
    )  # [B, N, K]
    assert got.transpose(0, 2, 1).shape == want.shape
    assert (got.transpose(0, 2, 1) == want).mean() == 1.0


def test_decode_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = mimi_config_from_hf(hf_cfg)
    params = _params(model, hf_cfg)
    toks = rng.integers(0, hf_cfg.codebook_size, size=(2, 4, 7)).astype(np.int64)
    with torch.no_grad():
        want = model.decode(torch.from_numpy(toks)).audio_values.numpy()[:, 0]
    q = _split_rvq_decode(params["quantizer"],
                          jnp.asarray(toks.transpose(0, 2, 1)),
                          cfg.num_semantic_quantizers)
    got = np.asarray(_decode_tower(params, q, cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-3)


def test_codec_api_roundtrip(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = mimi_config_from_hf(hf_cfg)
    params = _params(model, hf_cfg)
    codec = Mimi(512, 512, num_codebooks=4, model_config=cfg, params=params)
    sig = rng.standard_normal((1, 128)).astype(np.float32)
    toks = codec.sig_to_toks(jnp.asarray(sig))
    assert toks.shape[-1] == 4
    rec = codec.toks_to_sig(toks)
    assert rec.ndim == 2
    assert codec.embs().shape == (4, hf_cfg.codebook_size, 16)
