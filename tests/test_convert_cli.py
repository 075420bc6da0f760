"""End-to-end checkpoint conversion flow: HF save_pretrained → convert CLI →
npz → codec → exact token parity (the production weight path)."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# subprocess env: repo importable, forced-CPU jax (the ambient env may pin a
# remote TPU and not include the repo on PYTHONPATH)
CLI_ENV = {**os.environ, "PYTHONPATH": REPO, "JAX_PLATFORMS": "cpu"}


def test_convert_cli_roundtrip(rng, tmp_path):
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    cfg = EncodecConfig(
        target_bandwidths=[0.5, 2.0], sampling_rate=800, audio_channels=1,
        normalize=False, chunk_length_s=None, overlap=None, hidden_size=16,
        num_filters=4, num_residual_layers=1, upsampling_ratios=[4, 2],
        use_causal_conv=True, pad_mode="reflect", compress=2,
        num_lstm_layers=2, trim_right_ratio=1.0, codebook_size=32,
        codebook_dim=16,
    )
    model = EncodecModel(cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()
    src = tmp_path / "hf"
    out = tmp_path / "params.npz"
    model.save_pretrained(str(src))

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools/convert_checkpoints.py"),
         "convert", "encodec", str(src), str(out)],
        capture_output=True, text=True, env=CLI_ENV, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-500:]
    assert out.exists()

    from audiocodecs_tpu.convert.encodec import encodec_config_from_hf
    from audiocodecs_tpu.models.encodec import Encodec
    from audiocodecs_tpu.utils.checkpoint import load_params

    codec = Encodec(800, 800, num_codebooks=4,
                    model_config=encodec_config_from_hf(cfg),
                    params=load_params(str(out)))
    x = rng.standard_normal((2, 160)).astype(np.float32)
    got = np.asarray(codec.sig_to_toks(jnp.asarray(x)))
    with torch.no_grad():
        emb = model.encoder(torch.from_numpy(x)[:, None, :])
        residual, codes = emb, []
        for layer in model.quantizer.layers[:4]:
            idx = layer.encode(residual)
            codes.append(idx)
            residual = residual - layer.decode(idx)
        want = torch.stack(codes, -1).numpy()
    assert (got == want).mean() == 1.0


def test_convert_cli_hilcodec_partial(rng, tmp_path):
    """Vendor-CLI path for the hilcodec partial converter: a
    codebooks-only checkpoint REFUSES to convert by default (towers would
    stay random) and converts with ACX_ALLOW_PARTIAL_CONVERT=1 opt-in."""
    from audiocodecs_tpu.models.hilcodec import HILCodec
    from audiocodecs_tpu.utils.checkpoint import load_params

    mc = HILCodec.default_model_config()
    sd = {f"quantizer.layers.{k}.embed":
          torch.randn(mc.codebook_size, mc.emb_dim)
          for k in range(mc.num_quantizers)}
    src = tmp_path / "hil.pt"
    out = tmp_path / "hil.npz"
    torch.save(sd, str(src))
    cmd = [sys.executable,
           os.path.join(REPO, "tools/convert_checkpoints.py"),
           "convert", "hilcodec", str(src), str(out)]
    r = subprocess.run(cmd, capture_output=True, text=True, env=CLI_ENV,
                       cwd=REPO)
    assert r.returncode != 0
    assert "ACX_ALLOW_PARTIAL_CONVERT" in r.stderr

    r = subprocess.run(
        cmd, capture_output=True, text=True,
        env={**CLI_ENV, "ACX_ALLOW_PARTIAL_CONVERT": "1"}, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr[-500:]
    params = load_params(str(out))
    np.testing.assert_allclose(
        np.asarray(params["codebooks"][2]),
        sd["quantizer.layers.2.embed"].numpy(), atol=1e-6)
