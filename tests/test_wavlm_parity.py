"""Golden parity: JAX WavLM vs HF WavLMModel (random small config)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.wavlm import (
    convert_wavlm_state_dict,
    wavlm_config_from_hf,
)
from audiocodecs_tpu.nn.wavlm import apply_wavlm, wavlm_feature_extractor


@pytest.fixture(scope="module")
def hf_model():
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        conv_bias=False,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=32,
        max_bucket_distance=50,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
    )
    model = WavLMModel(cfg).eval()
    return model, cfg


def test_feature_extractor_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = wavlm_config_from_hf(hf_cfg)
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        want = model.feature_extractor(torch.from_numpy(x)).numpy()  # [B,C,N]
    got = np.asarray(
        wavlm_feature_extractor(params["feature_extractor"], jnp.asarray(x), cfg)
    )
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5,
                               rtol=1e-4)


def test_full_encoder_parity(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = wavlm_config_from_hf(hf_cfg)
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).last_hidden_state.numpy()
    got = np.asarray(apply_wavlm(params, jnp.asarray(x), cfg))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=5e-3)


def test_intermediate_layer_output(rng, hf_model):
    model, hf_cfg = hf_model
    cfg = wavlm_config_from_hf(hf_cfg)
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((1, 800)).astype(np.float32)
    with torch.no_grad():
        hs = model(torch.from_numpy(x), output_hidden_states=True).hidden_states
    got = np.asarray(apply_wavlm(params, jnp.asarray(x), cfg, output_layer=1))
    np.testing.assert_allclose(got, hs[1].numpy(), atol=5e-4, rtol=5e-3)


@pytest.fixture(scope="module")
def hf_large_style():
    """WavLM-large style: pre-norm encoder + per-layer LN feature extractor
    + conv biases (microsoft/wavlm-large, the reference's WavLM+k-means
    default, wavlm_kmeans.py:49)."""
    from transformers import WavLMConfig, WavLMModel

    torch.manual_seed(3)
    cfg = WavLMConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        num_buckets=32,
        max_bucket_distance=50,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
    )
    return WavLMModel(cfg).eval(), cfg


def test_wavlm_stable_layer_norm_parity(rng, hf_large_style):
    model, hf_cfg = hf_large_style
    cfg = wavlm_config_from_hf(hf_cfg)
    assert cfg.do_stable_layer_norm and cfg.feat_extract_norm == "layer"
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x), output_hidden_states=True)
    # final hidden state (post final-LN)
    got = np.asarray(apply_wavlm(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, out.last_hidden_state.numpy(),
                               atol=3e-5, rtol=1e-4)
    # intermediate layer taps (pre final-LN), as the codecs consume them
    for layer in (1, 2):
        got = np.asarray(
            apply_wavlm(params, jnp.asarray(x), cfg, output_layer=layer))
        np.testing.assert_allclose(got, out.hidden_states[layer].numpy(),
                                   atol=3e-5, rtol=1e-4)


def test_wav2vec2_xlsr_style_parity(rng):
    """Plain-attention variant == HF Wav2Vec2Model (XLSR style: pre-norm +
    layer-norm extractor, no gated relative-position bias). BiCodec's
    semantic feature extractor (reference bicodec.py via Spark-TTS)."""
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    from audiocodecs_tpu.convert.wavlm import wav2vec2_config_from_hf

    torch.manual_seed(4)
    hf_cfg = Wav2Vec2Config(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2],
        conv_stride=[5, 2, 2],
        conv_bias=True,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
    )
    model = Wav2Vec2Model(hf_cfg).eval()
    cfg = wav2vec2_config_from_hf(hf_cfg)
    assert not cfg.gated_rel_pos
    params = convert_wavlm_state_dict(model.state_dict(), cfg)
    assert "rel_attn_embed" not in params

    x = rng.standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(x), output_hidden_states=True)
    got = np.asarray(apply_wavlm(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(got, out.last_hidden_state.numpy(),
                               atol=3e-5, rtol=1e-4)
    # the layer mix BiCodec consumes (hidden_states 11/14/16 upstream);
    # interior taps are pre-LN, and — matching HF — the FINAL entry of the
    # stack is post-final-LN (review finding: previously un-normed)
    for layer in (1, 2):
        got = np.asarray(
            apply_wavlm(params, jnp.asarray(x), cfg, output_layer=layer))
        np.testing.assert_allclose(got, out.hidden_states[layer].numpy(),
                                   atol=3e-5, rtol=1e-4)
    stack = np.asarray(apply_wavlm(params, jnp.asarray(x), cfg,
                                   output_hidden_states=True))
    np.testing.assert_allclose(stack[-1],
                               out.hidden_states[-1].numpy(),
                               atol=3e-5, rtol=1e-4)
