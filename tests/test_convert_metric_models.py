"""Staged real-weight conversion one-liners for the metric models
(Whisper / GPT-2 / UTMOS): the exact ``tools/convert_checkpoints.py``
command lines documented for the moment network access exists, dry-run
against synthesized HF/hub layouts (reference counterparts download at
first use: ``metrics/dwer.py:45-49``, ``metrics/perplexity.py``,
``metrics/utmos.py:35-37``)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from convert_checkpoints import main as convert_main  # noqa: E402


def test_whisper_one_liner(tmp_path):
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    hf_cfg = HFConfig(
        vocab_size=64, num_mel_bins=80, d_model=32, encoder_layers=1,
        encoder_attention_heads=4, decoder_layers=1,
        decoder_attention_heads=4, encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=1500, max_target_positions=48,
        eos_token_id=1, decoder_start_token_id=2, pad_token_id=0,
        bos_token_id=0, dropout=0.0, attention_dropout=0.0,
        activation_dropout=0.0,
    )
    torch.manual_seed(0)
    src = tmp_path / "whisper-small"
    WhisperForConditionalGeneration(hf_cfg).eval().save_pretrained(str(src))

    out = tmp_path / "whisper.npz"
    rc = convert_main(["convert", "whisper", str(src), str(out)])
    assert rc == 0 and out.exists()

    from audiocodecs_tpu.utils.checkpoint import load_params

    params = load_params(str(out))
    assert "encoder" in params and "decoder" in params


def test_gpt2_one_liner(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel

    hf_cfg = GPT2Config(vocab_size=64, n_positions=32, n_embd=16,
                        n_layer=2, n_head=2)
    torch.manual_seed(0)
    src = tmp_path / "gpt2"
    GPT2LMHeadModel(hf_cfg).eval().save_pretrained(str(src))

    out = tmp_path / "gpt2.npz"
    rc = convert_main(["convert", "gpt2", str(src), str(out)])
    assert rc == 0 and out.exists()

    from audiocodecs_tpu.utils.checkpoint import load_params

    params = load_params(str(out))
    assert "wte" in params or "blocks" in params or len(params) > 0


def test_utmos_one_liner(tmp_path, monkeypatch):
    """Hub-layout checkpoint file → one CLI command → loadable npz (tiny
    config monkeypatched in; the real run uses the full default)."""
    import audiocodecs_tpu.downstream.metrics.utmos as um
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    tiny = um.UTMOSConfig(
        ssl=WavLMConfig(hidden_size=16, num_layers=2, num_heads=2,
                        intermediate_size=32, conv_dim=(8, 8),
                        conv_kernel=(10, 4), conv_stride=(5, 2),
                        num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=4,
                        gated_rel_pos=False),
        emb_dim=4, num_domains=2, num_judges=8, blstm_hidden=8,
        proj_hidden=16, judge_id=3)
    monkeypatch.setattr(um, "UTMOSConfig", lambda: tiny)

    rng = np.random.default_rng(0)
    sd = {k: torch.from_numpy(rng.standard_normal(s).astype(np.float32))
          for k, s in um.utmos_schema(tiny, layout="hub").items()}
    src = tmp_path / "utmos22_strong.pt"
    torch.save(sd, str(src))

    out = tmp_path / "utmos.npz"
    rc = convert_main(["convert", "utmos", str(src), str(out)])
    assert rc == 0 and out.exists()

    # the converted file drives the on-device metric directly
    stats = um.make_utmos_jax_metric(str(out), tiny)
    sig = (rng.standard_normal(1600) * 0.1).astype(np.float32)
    score = stats.metric([sig], 16000)[0]
    assert np.isfinite(score)
