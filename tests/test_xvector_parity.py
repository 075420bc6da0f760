"""Golden parity: JAX WavLM x-vector speaker encoder vs HF WavLMForXVector."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.wavlm import wavlm_config_from_hf
from audiocodecs_tpu.downstream.models.speaker_encoder import (
    XVectorConfig,
    apply_xvector,
    convert_xvector_state_dict,
)


def test_xvector_parity(rng):
    from transformers import WavLMConfig, WavLMForXVector

    torch.manual_seed(0)
    hf_cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2], conv_bias=False,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=50, do_stable_layer_norm=False,
        feat_extract_norm="group", layerdrop=0.0, hidden_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, activation_dropout=0.0,
        final_dropout=0.0,
        tdnn_dim=[24, 24, 24, 24, 48], tdnn_kernel=[5, 3, 3, 1, 1],
        tdnn_dilation=[1, 2, 3, 1, 1], xvector_output_dim=16,
        use_weighted_layer_sum=True,
    )
    model = WavLMForXVector(hf_cfg).eval()
    cfg = XVectorConfig(
        wavlm=wavlm_config_from_hf(hf_cfg),
        tdnn_dim=tuple(hf_cfg.tdnn_dim),
        tdnn_kernel=tuple(hf_cfg.tdnn_kernel),
        tdnn_dilation=tuple(hf_cfg.tdnn_dilation),
        xvector_dim=hf_cfg.xvector_output_dim,
        use_weighted_layer_sum=True,
    )
    params = convert_xvector_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 2000)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x)).embeddings.numpy()
    got = np.asarray(apply_xvector(params, jnp.asarray(x), cfg))
    assert got.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-4 * scale, rtol=1e-3)
    # embeddings discriminate different inputs
    assert np.abs(got[0] - got[1]).max() > 0.01 * scale
