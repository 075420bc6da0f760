"""Converter-helper edge cases: weight-norm folding (both torch namings),
transposed-kernel flips, LSTM bias merging."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from audiocodecs_tpu.convert.torch_utils import (
    conv_transpose_weight,
    conv_weight,
    fold_weight_norm_np,
    lstm_layer_params,
)


def test_weight_norm_fold_matches_torch(rng):
    conv = torch.nn.Conv1d(4, 6, 3)
    wn = torch.nn.utils.parametrizations.weight_norm(conv)
    folded_torch = wn.weight.detach().numpy()  # parametrization materializes
    sd = {f"m.conv.{k}": v for k, v in wn.state_dict().items()}
    ours = conv_weight(sd, "m.conv")
    np.testing.assert_allclose(
        ours["w"].transpose(2, 1, 0), folded_torch, atol=1e-6
    )


def test_legacy_weight_g_v_naming(rng):
    w = rng.standard_normal((6, 4, 3)).astype(np.float32)
    g = rng.standard_normal((6, 1, 1)).astype(np.float32)
    sd = {"c.weight_g": torch.tensor(g), "c.weight_v": torch.tensor(w),
          "c.bias": torch.zeros(6)}
    ours = conv_weight(sd, "c")
    want = fold_weight_norm_np(g, w)
    np.testing.assert_allclose(ours["w"].transpose(2, 1, 0), want, atol=1e-6)


def test_conv_transpose_flip_matches_torch(rng):
    """Converted transposed-conv weights reproduce torch ConvTranspose1d."""
    import jax.numpy as jnp

    from audiocodecs_tpu.nn.layers import conv_transpose1d

    m = torch.nn.ConvTranspose1d(4, 6, kernel_size=8, stride=4)
    sd = {f"m.{k}": v for k, v in m.state_dict().items()}
    p = conv_transpose_weight(sd, "m")
    x = rng.standard_normal((2, 5, 4)).astype(np.float32)
    with torch.no_grad():
        want = m(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
    got = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(p["w"]),
                                      jnp.asarray(p["b"]), stride=4))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_lstm_bias_merge():
    m = torch.nn.LSTM(3, 5, num_layers=1)
    sd = {f"m.{k}": v for k, v in m.state_dict().items()}
    p = lstm_layer_params(sd, "m", 1)[0]
    want = (m.bias_ih_l0 + m.bias_hh_l0).detach().numpy()
    np.testing.assert_allclose(p["b"], want, atol=1e-7)
    assert p["w_ih"].shape == (3, 20) and p["w_hh"].shape == (5, 20)
