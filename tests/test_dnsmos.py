"""DNSMOS-as-JAX tests: onnx parse, forward parity vs a torch oracle,
mel front-end checks, end-to-end behavior.

The reference runs ``model_v8.onnx`` via onnxruntime (reference
``metrics/dnsmos.py:45-152``); onnxruntime does not exist here, so the CNN
forward is cross-checked against an independent torch reimplementation of
the parsed graph (same weights, torch's conv/pool semantics as oracle).
"""

import os

import numpy as np
import pytest

ONNX_PATH = "/root/reference/downstream/metrics/model_v8.onnx"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ONNX_PATH), reason="reference model_v8.onnx not present"
)


@pytest.fixture(scope="module")
def params():
    from audiocodecs_tpu.convert.dnsmos import convert_dnsmos_onnx

    return convert_dnsmos_onnx(ONNX_PATH)


def test_conversion_shapes(params):
    assert [p["w"].shape for p in params["conv"]] == [
        (32, 1, 3, 3), (32, 32, 3, 3), (32, 32, 3, 3), (32, 32, 3, 3),
        (64, 32, 3, 3),
    ]
    assert [p["w"].shape for p in params["dense"]] == [
        (64, 64), (64, 64), (64, 1),
    ]
    for p in params["conv"] + params["dense"]:
        assert np.isfinite(p["w"]).all() and np.isfinite(p["b"]).all()


def test_onnx_parser_consumes_all_initializers():
    from audiocodecs_tpu.convert.onnx_lite import read_onnx

    g = read_onnx(ONNX_PATH)
    assert g.inputs == ["input_1"]
    assert len(g.initializers) == 16  # 5 convs + 3 denses, w+b each
    ops = [n.op_type for n in g.nodes]
    assert ops.count("Conv") == 5 and ops.count("MaxPool") == 3
    assert ops.count("MatMul") == 3


def _torch_forward(params, mel):
    """Independent oracle: the parsed graph in torch semantics."""
    import torch
    import torch.nn.functional as F

    has_pool = [True, True, False, True, False]
    h = torch.from_numpy(mel)[:, None, :, :]
    for p, pool in zip(params["conv"], has_pool):
        h = F.relu(F.conv2d(h, torch.from_numpy(p["w"].copy()),
                            torch.from_numpy(p["b"].copy()), padding=1))
        if pool:
            h = F.max_pool2d(h, 2, 2)
    h = torch.amax(h, dim=(2, 3))
    for i, p in enumerate(params["dense"]):
        h = h @ torch.from_numpy(p["w"].copy()) + torch.from_numpy(p["b"].copy())
        if i < 2:
            h = F.relu(h)
    return h[:, 0].numpy()


def test_forward_parity_vs_torch(params, rng, tmp_path):
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.metrics import dnsmos as D

    out = tmp_path / "dnsmos.npz"
    D.save_dnsmos_params(ONNX_PATH, str(out))
    fwd = D._jitted_forward(str(out))

    # feed a fake mel directly through the CNN part of both pipelines:
    # reuse the jitted forward on raw audio and the torch oracle on the
    # JAX-computed mel, so mel + CNN are checked together.
    x = rng.standard_normal((2, D.MEL_SAMPLES)).astype(np.float32) * 0.1
    got = np.asarray(fwd(jnp.asarray(x)))

    # recompute the mel in numpy exactly as the module does
    melfb = D.mel_filterbank_slaney()
    n = 2 * np.pi * np.arange(D.N_FFT) / D.N_FFT
    win = 0.5 - 0.5 * np.cos(n)
    mels = []
    for b in range(2):
        xp = np.pad(x[b], (D.N_FFT // 2, D.N_FFT // 2))
        n_frames = 1 + (len(xp) - D.N_FFT) // D.HOP
        frames = np.stack([xp[i * D.HOP : i * D.HOP + D.N_FFT] * win
                           for i in range(n_frames)])
        power = np.abs(np.fft.rfft(frames, axis=-1)) ** 2
        mel = power @ melfb.T
        db = 10 * np.log10(np.maximum(mel, 1e-10))
        db = np.maximum(db - db.max(), -80.0)
        mels.append(((db + 40.0) / 40.0).astype(np.float32))
    want = _torch_forward(params, np.stack(mels))
    # f32 on-device mel vs f64 numpy mel → ~0.2% drift on a 1-5 MOS scale
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_mel_filterbank_properties():
    from audiocodecs_tpu.downstream.metrics.dnsmos import mel_filterbank_slaney

    fb = mel_filterbank_slaney()
    assert fb.shape == (120, 161)
    assert (fb >= 0).all()
    # every filter has support, and interior FFT bins are covered
    assert (fb.sum(axis=1) > 0).all()
    assert (fb[:, 3:-3].sum(axis=0) > 0).any()
    # filters are ordered: the argmax bin is non-decreasing over bands
    centers = fb.argmax(axis=1)
    assert (np.diff(centers) >= 0).all()
    # (at n_fft=321/n_mels=120 some low filters fall between FFT bins and
    # carry near-zero mass — librosa's filterbank does the same here.)


def test_end_to_end_ordering():
    from audiocodecs_tpu.downstream.metrics.dnsmos import (
        DEFAULT_PARAMS_PATH,
        dnsmos_p808,
        make_dnsmos_jax_metric,
    )

    assert os.path.exists(DEFAULT_PARAMS_PATH), "shipped dnsmos_v8.npz missing"
    rng = np.random.default_rng(0)
    fs = 16000
    t = np.arange(3 * fs) / fs
    env = np.sin(2 * np.pi * 2.5 * t) ** 2
    clean = env * sum(np.sin(2 * np.pi * f * t) for f in (220, 440, 880)) * 0.1
    noisy = 0.2 * rng.standard_normal(len(t))
    s_clean = dnsmos_p808(clean, fs)
    s_noise = dnsmos_p808(noisy, fs)
    assert 1.0 < s_noise < s_clean < 5.0

    stats = make_dnsmos_jax_metric()
    stats.append(["a", "b"], [clean, noisy], fs)
    assert stats.summarize("count") == 2
    assert abs(stats.summarize("max_score") - s_clean) < 1e-5

    # 24 kHz input goes through the resample path like the reference wrapper
    from audiocodecs_tpu.downstream.metrics.stoi import _resample_np

    clean24 = _resample_np(clean, fs, 24000)
    assert abs(dnsmos_p808(clean24, 24000) - s_clean) < 0.15
