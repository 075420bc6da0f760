"""Golden parity: JAX Wav2Vec2-BERT vs HF ``Wav2Vec2BertModel``.

XCodec2's semantic branch (reference ``audiocodecs/xcodec2.py:55``) is
``facebook/w2v-bert-2.0``; these tests pin our conformer port and the
SeamlessM4T mel front-end to the installed-``transformers`` oracle.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.w2vbert import convert_w2vbert_state_dict
from audiocodecs_tpu.nn.w2vbert import (
    W2VBertConfig,
    apply_w2vbert,
    w2vbert_features,
)


@pytest.fixture(scope="module")
def hf_toy():
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(0)
    cfg = Wav2Vec2BertConfig(
        hidden_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=64,
        feature_projection_input_dim=20,
        left_max_position_embeddings=8,
        right_max_position_embeddings=3,
        conv_depthwise_kernel_size=7,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        activation_dropout=0.0,
        conformer_conv_dropout=0.0,
        layerdrop=0.0,
    )
    return Wav2Vec2BertModel(cfg).eval(), cfg


def test_w2vbert_toy_parity(rng, hf_toy):
    model, hf_cfg = hf_toy
    cfg = W2VBertConfig(
        hidden_size=32, num_layers=3, num_heads=4, intermediate_size=64,
        input_dim=20, left_max_positions=8, right_max_positions=3,
        conv_kernel=7,
    )
    params = convert_w2vbert_state_dict(model.state_dict(), num_layers=3)
    feats = rng.standard_normal((2, 17, 20)).astype(np.float32)
    with torch.no_grad():
        out = model(torch.from_numpy(feats), output_hidden_states=True)
    for layer in (0, 2, 3):
        want = out.hidden_states[layer].numpy()
        got = np.asarray(
            apply_w2vbert(params, jnp.asarray(feats), cfg,
                          output_layer=layer)
        )
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_feature_extractor_parity(rng):
    from transformers import SeamlessM4TFeatureExtractor

    fe = SeamlessM4TFeatureExtractor()
    wav = (0.1 * rng.standard_normal((2, 16000))).astype(np.float32)
    want = fe(list(wav), sampling_rate=16000, return_tensors="np")[
        "input_features"
    ]
    got = np.asarray(w2vbert_features(jnp.asarray(wav)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


def test_w2vbert_default_config_layer16_parity(rng):
    """Full released-architecture shape (w2v-bert-2.0 defaults), random
    weights, layer-16 features — the tensor XCodec2 actually consumes."""
    from transformers import Wav2Vec2BertConfig, Wav2Vec2BertModel

    torch.manual_seed(1)
    hf_cfg = Wav2Vec2BertConfig(
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        activation_dropout=0.0, conformer_conv_dropout=0.0, layerdrop=0.0,
    )
    model = Wav2Vec2BertModel(hf_cfg).eval()
    params = convert_w2vbert_state_dict(model.state_dict(), num_layers=24)
    cfg = W2VBertConfig()

    feats = rng.standard_normal((1, 24, 160)).astype(np.float32)
    with torch.no_grad():
        want = model(
            torch.from_numpy(feats), output_hidden_states=True
        ).hidden_states[16].numpy()
    got = np.asarray(
        apply_w2vbert(params, jnp.asarray(feats), cfg, output_layer=16)
    )
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
