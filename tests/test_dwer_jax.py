"""First-party on-device dWER: byte-level decode parity + end-to-end metric.

The decoder must agree with HF's byte-level BPE decode (the tokenizer
Whisper uses); the metric must run the full JAX transcription path from a
converted checkpoint directory with no torch at metric time.
"""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from audiocodecs_tpu.downstream.metrics.dwer_jax import (
    ByteLevelDecoder,
    make_dwer_jax_metric,
    whisper_forced_tokens,
)
from audiocodecs_tpu.utils.bytebpe import bytes_to_unicode as _bytes_to_unicode


def _toy_vocab():
    """Byte-level vocab: 256 single-byte tokens + a few merged pieces."""
    b2u = _bytes_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}
    for piece in ["Ġthe", "Ġcat", "Ġsat", "hello", "Ġwörld"]:
        # pieces are given in unicode-mapped space already except non-ascii
        mapped = "".join(b2u[b] for b in piece.replace("Ġ", " ").encode())
        vocab.setdefault(mapped, len(vocab))
    vocab["<|endoftext|>"] = len(vocab)
    return vocab


def test_decode_matches_hf_gpt2_tokenizer(tmp_path):
    transformers = pytest.importorskip("transformers")
    vocab = _toy_vocab()
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")
    hf = transformers.GPT2Tokenizer(str(tmp_path / "vocab.json"),
                                    str(tmp_path / "merges.txt"))
    ours = ByteLevelDecoder(vocab)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, len(vocab) - 1, size=40).tolist()  # excl. special
    assert ours.decode(ids) == hf.decode(ids)
    # multi-byte utf-8 sequences survive the round trip
    text = " the cat sat hello wörld"
    enc = [vocab[c] for c in "".join(
        {b: u for b, u in _bytes_to_unicode().items()}[b]
        for b in text.encode())]
    assert ours.decode(enc) == text


def test_special_tokens_dropped():
    vocab = _toy_vocab()
    ours = ByteLevelDecoder(vocab, special_ids={0})
    eot = vocab["<|endoftext|>"]
    a = vocab["".join(_bytes_to_unicode()[b] for b in b"hello")]
    assert ours.decode([eot, a, 0]) == "hello"


def test_forced_tokens_multilingual_and_english_only():
    vocab = _toy_vocab()
    base = len(vocab)
    ml = dict(vocab)
    for i, t in enumerate(["<|startoftranscript|>", "<|en|>",
                           "<|transcribe|>", "<|notimestamps|>"]):
        ml[t] = base + i
    d = ByteLevelDecoder(ml)
    assert whisper_forced_tokens(d, base, "en") == [base, base + 1,
                                                    base + 2, base + 3]
    en_only = dict(vocab)
    en_only["<|startoftranscript|>"] = base
    en_only["<|notimestamps|>"] = base + 1
    d2 = ByteLevelDecoder(en_only)
    assert whisper_forced_tokens(d2, base, "en") == [base, base + 1]
    # .en released checkpoints: tokenizer CONTAINS language tokens but the
    # model was never trained with them — multilingual=False must win
    assert whisper_forced_tokens(d, base, "en", multilingual=False) == \
        [base, base + 3]
    # unknown language on a multilingual model raises, not degrades
    with pytest.raises(ValueError, match="english"):
        whisper_forced_tokens(d, base, "english")


def test_released_checkpoint_multilingual_detection():
    from audiocodecs_tpu.nn.whisper import WhisperConfig

    assert WhisperConfig(vocab_size=51865).multilingual
    assert not WhisperConfig(vocab_size=51864).multilingual


def test_missing_config_json_raises(tmp_path):
    (tmp_path / "vocab.json").write_text(json.dumps(_toy_vocab()))
    with pytest.raises(ValueError, match="config.json"):
        make_dwer_jax_metric(str(tmp_path / "whisper.npz"), str(tmp_path))


@pytest.fixture(scope="module")
def tiny_whisper_dir(tmp_path_factory):
    """A converted toy Whisper checkpoint dir: params.npz + tokenizer files."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from audiocodecs_tpu.convert.whisper import (
        convert_whisper_state_dict,
        whisper_config_from_hf,
    )
    from audiocodecs_tpu.utils.checkpoint import save_params

    vocab = _toy_vocab()
    base = len(vocab)
    vocab["<|startoftranscript|>"] = base
    vocab["<|notimestamps|>"] = base + 1
    hf_cfg = HFConfig(
        vocab_size=len(vocab), num_mel_bins=80, d_model=32,
        encoder_layers=1, encoder_attention_heads=4,
        decoder_layers=1, decoder_attention_heads=4,
        encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=1500, max_target_positions=48,
        eos_token_id=vocab["<|endoftext|>"],
        decoder_start_token_id=base, pad_token_id=0, bos_token_id=0,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(1)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    cfg = whisper_config_from_hf(hf_cfg)
    params = convert_whisper_state_dict(model.state_dict(), cfg)
    d = tmp_path_factory.mktemp("whisper_ckpt")
    save_params(str(d / "whisper.npz"), params)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "config.json").write_text(json.dumps({
        "vocab_size": hf_cfg.vocab_size, "num_mel_bins": 80, "d_model": 32,
        "encoder_layers": 1, "encoder_attention_heads": 4,
        "decoder_layers": 1, "decoder_attention_heads": 4,
        "encoder_ffn_dim": 48, "decoder_ffn_dim": 48,
        "max_source_positions": 1500, "max_target_positions": 48,
        "eos_token_id": hf_cfg.eos_token_id,
        "decoder_start_token_id": base,
    }))
    return d


def test_dwer_jax_end_to_end(tiny_whisper_dir):
    stats = make_dwer_jax_metric(
        str(tiny_whisper_dir / "whisper.npz"), str(tiny_whisper_dir),
        max_new_tokens=6)
    rng = np.random.default_rng(2)
    sigs = [rng.standard_normal(16000).astype(np.float32) * 0.05
            for _ in range(2)]
    # identical hyp/ref → identical transcripts → dWER/dCER exactly 0
    scores = stats.metric(sigs, sigs, 16000)
    assert len(scores) == 2
    assert all(s == 0.0 for s in scores)
    assert all(c == 0.0 for c in stats.cer(sigs, sigs, 16000))
    texts = stats.transcribe(sigs, 16000)
    assert all(isinstance(t, str) for t in texts)
    # transcripts are normalized like the reference (Whisper normalizer)
    assert stats.normalize("Mr. Smith won't!") == "mister smith will not"


def test_char_error_rate():
    from audiocodecs_tpu.downstream.metrics.external import char_error_rate

    assert char_error_rate(["abc"], ["abc"]) == 0.0
    # speechbrain ErrorRateStats(split_tokens=True) joins words with a '_'
    # boundary token: "ab_cd" vs "ab_ce" → 1 sub / 5 ref tokens
    assert char_error_rate(["ab cd"], ["ab ce"]) == 0.2
    # the boundary token stops alignments merging across word boundaries
    # and counts word-structure errors: "a b" vs "ab" → "a_b" vs "ab"
    assert char_error_rate(["a b"], ["ab"]) == 0.5


def test_dwer_dispatch_from_external(tiny_whisper_dir):
    from audiocodecs_tpu.downstream.metrics.external import make_dwer_metric

    stats = make_dwer_metric(checkpoint=str(tiny_whisper_dir / "whisper.npz"),
                             tokenizer_path=str(tiny_whisper_dir))
    assert stats.name == "dWER"
