"""First-party BPE/unigram tokenizers (reference trains SentencePiece over
the train manifest: token_type bpe, num_tokens 1000 — reference
``downstream/hparams/tasks/asr.yaml:54-55,97-103``)."""

import pytest

from audiocodecs_tpu.downstream.text import (
    BPETokenizer,
    UnigramTokenizer,
    build_tokenizer,
)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the hats",
    "a cat and a hat",
    "the hat that the cat wore",
    "mats and hats and cats",
]


@pytest.mark.parametrize("cls", [BPETokenizer, UnigramTokenizer])
def test_roundtrip_on_training_text(cls):
    tok = cls(TEXTS, vocab_size=64)
    for t in TEXTS:
        ids = tok.encode(t)
        assert ids, t
        assert tok.decode(ids) == t
    assert tok.vocab_size <= 64
    assert tok.blank_id == 0


@pytest.mark.parametrize("cls", [BPETokenizer, UnigramTokenizer])
def test_unseen_words_encode_via_smaller_pieces(cls):
    tok = cls(TEXTS, vocab_size=64)
    ids = tok.encode("that cast")  # unseen words, seen characters
    assert tok.decode(ids) == "that cast"


def test_bpe_merges_compress_vs_chars():
    tok = BPETokenizer(TEXTS, vocab_size=64)
    char_len = len("the cat sat".replace(" ", "")) + 3  # incl. ▁ markers
    assert len(tok.encode("the cat sat")) < char_len
    # frequent whole words become single pieces
    assert len(tok._encode_word("▁the")) == 1


def test_bpe_deterministic():
    a = BPETokenizer(TEXTS, vocab_size=48)
    b = BPETokenizer(TEXTS, vocab_size=48)
    assert a.itos == b.itos
    assert a.encode(TEXTS[0]) == b.encode(TEXTS[0])


def test_vocab_size_cap_and_early_stop():
    # tiny corpus: fewer repeating pairs than requested merges
    tok = BPETokenizer(["ab", "cd"], vocab_size=1000)
    assert tok.vocab_size < 20


def test_character_coverage_drops_rare_chars():
    texts = ["aaa bbb ccc"] * 50 + ["q"]  # 'q' is 1/451 of chars
    tok = BPETokenizer(texts, vocab_size=64, character_coverage=0.99)
    assert "q" not in tok.stoi
    ids = tok.encode("q aaa")
    assert tok.unk_id in ids
    assert tok.decode(ids).strip() == "aaa"


def test_unigram_prefers_likely_segmentation():
    tok = UnigramTokenizer(TEXTS, vocab_size=64)
    ids = tok.encode("the the the")
    # frequent word should be a short segmentation, not per-char
    assert len(ids) <= 6


def test_factory_dispatch():
    assert isinstance(build_tokenizer(TEXTS, "bpe", 64), BPETokenizer)
    assert isinstance(build_tokenizer(TEXTS, "unigram", 64),
                      UnigramTokenizer)
    char = build_tokenizer(TEXTS, "char")
    assert char.decode(char.encode("the cat")) == "the cat"
    with pytest.raises(ValueError, match="token_type"):
        build_tokenizer(TEXTS, "wordpiece")


def test_bpe_never_merges_across_unk():
    """With character_coverage < 1, pairs containing <unk> must never get
    a merge rank: a recorded unk-merge would make encode() collapse
    '<unk>'+char into one <unk>, silently deleting the character."""
    from audiocodecs_tpu.downstream.text import BPETokenizer

    # 'q' is rare → maps to <unk>; it is always followed by 'tt', making
    # ('<unk>','t') a frequent pair the trainer must refuse to merge
    texts = ["qtt tt tt tt tt", "aa aa aa"]
    tok = BPETokenizer(texts, vocab_size=12, character_coverage=0.96)
    assert "q" not in tok.stoi, tok.itos  # premise: q is unk-mapped
    assert all("<unk>" not in p[0] and "<unk>" not in p[1]
               for p in tok.merge_ranks), tok.merge_ranks
    ids = tok.encode("qtt")
    # the rare char maps to unk but BOTH t's survive (as 't t' or 'tt')
    decoded = tok.decode([i for i in ids if i != tok.unk_id])
    assert decoded.replace(" ", "") == "tt", (ids, decoded)
