"""LSTM / BiLSTM parity vs torch.nn.LSTM with converted weights."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from audiocodecs_tpu.convert.torch_utils import lstm_layer_params
from audiocodecs_tpu.nn.lstm import bilstm, lstm


def test_stacked_lstm_matches_torch(rng):
    torch.manual_seed(0)
    m = torch.nn.LSTM(12, 16, num_layers=2).eval()
    sd = {"m." + k: v for k, v in m.state_dict().items()}
    params = lstm_layer_params(sd, "m", 2)
    x = rng.standard_normal((3, 9, 12)).astype(np.float32)
    with torch.no_grad():
        want, (h, c) = m(torch.from_numpy(x).transpose(0, 1))
    got, state = lstm(jnp.asarray(x), params)
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 1).numpy(), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(state[1][0]), h[1].numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(state[1][1]), c[1].numpy(), atol=1e-6)


def test_bilstm_matches_torch(rng):
    torch.manual_seed(1)
    m = torch.nn.LSTM(8, 8, num_layers=2, bidirectional=True).eval()
    sd = m.state_dict()

    def layer(n):
        fwd = lstm_layer_params(
            {"m." + k: v for k, v in sd.items()
             if not k.endswith("_reverse")}, "m", 2
        )[n]
        bwd_sd = {
            "m." + k.replace("_reverse", ""): v
            for k, v in sd.items() if k.endswith("_reverse")
        }
        bwd = lstm_layer_params(bwd_sd, "m", 2)[n]
        return {"fwd": fwd, "bwd": bwd}

    params = [layer(0), layer(1)]
    x = rng.standard_normal((2, 7, 8)).astype(np.float32)
    with torch.no_grad():
        want, _ = m(torch.from_numpy(x).transpose(0, 1))
    got = bilstm(jnp.asarray(x), params)
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 1).numpy(), atol=1e-6
    )
