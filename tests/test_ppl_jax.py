"""First-party ASR perplexity: GPT-2 parity, BPE encode parity, end-to-end.

Oracles: HF ``GPT2LMHeadModel`` (logits + ``labels=`` loss → perplexity)
and ``GPT2Tokenizer`` (byte-level BPE encode) on toy vocab/merges built
in-test — the same offline-oracle strategy as the codec converters.
"""

import json

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from audiocodecs_tpu.convert.gpt2 import (
    convert_gpt2_state_dict,
    gpt2_config_from_hf,
)
from audiocodecs_tpu.nn.gpt2 import GPT2Config, gpt2_logits, gpt2_nll, init_gpt2_params
from audiocodecs_tpu.utils.bytebpe import ByteLevelBPE, bytes_to_unicode


def _toy_tokenizer_files(tmp_path):
    """Byte-level vocab + a few real merges over ascii lowercase words."""
    b2u = bytes_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}
    merges = []
    # merge chains: "th", "the", "Ġt", "Ġth", "Ġthe", "at", "cat"
    for a, b in [("t", "h"), ("th", "e"), (b2u[ord(" ")], "t"),
                 (b2u[ord(" ")] + "t", "h"), (b2u[ord(" ")] + "th", "e"),
                 ("a", "t"), ("c", "at")]:
        merges.append((a, b))
        vocab.setdefault(a + b, len(vocab))
    vocab["<|endoftext|>"] = len(vocab)
    (tmp_path / "vocab.json").write_text(json.dumps(vocab))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
    return vocab, merges


@pytest.fixture(scope="module")
def hf_gpt2():
    from transformers import GPT2Config as HFConfig
    from transformers import GPT2LMHeadModel

    torch.manual_seed(0)
    hf_cfg = HFConfig(vocab_size=300, n_positions=64, n_embd=32,
                      n_layer=2, n_head=4, resid_pdrop=0.0,
                      embd_pdrop=0.0, attn_pdrop=0.0)
    model = GPT2LMHeadModel(hf_cfg).eval()
    cfg = gpt2_config_from_hf(hf_cfg)
    params = convert_gpt2_state_dict(model.state_dict(), cfg)
    return model, cfg, params


def test_encode_matches_hf_gpt2_tokenizer(tmp_path):
    import transformers

    _toy_tokenizer_files(tmp_path)
    hf = transformers.GPT2Tokenizer(str(tmp_path / "vocab.json"),
                                    str(tmp_path / "merges.txt"))
    ours = ByteLevelBPE.from_dir(str(tmp_path))
    for text in ["the cat sat on the hat", "that  that", "thee",
                 "don't chat, matt!", "wörld théâtre", "  leading", ""]:
        assert ours.encode(text) == hf.encode(text), text
        assert ours.decode(ours.encode(text)) == text


def test_encode_roundtrip_random_bytes(tmp_path):
    _toy_tokenizer_files(tmp_path)
    ours = ByteLevelBPE.from_dir(str(tmp_path))
    rng = np.random.default_rng(0)
    text = bytes(rng.integers(32, 127, 200).tolist()).decode()
    assert ours.decode(ours.encode(text)) == text


def test_gpt2_logits_parity(rng, hf_gpt2):
    model, cfg, params = hf_gpt2
    toks = rng.integers(0, cfg.vocab_size, (2, 9)).astype(np.int64)
    with torch.no_grad():
        want = model(torch.from_numpy(toks)).logits.numpy()
    got = np.asarray(gpt2_logits(params, jnp.asarray(toks), cfg))
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_gpt2_ppl_matches_hf_loss(rng, hf_gpt2):
    model, cfg, params = hf_gpt2
    toks = rng.integers(0, cfg.vocab_size, (1, 12)).astype(np.int64)
    with torch.no_grad():
        loss = float(model(torch.from_numpy(toks),
                           labels=torch.from_numpy(toks)).loss)
    nll = float(gpt2_nll(params, jnp.asarray(toks),
                         jnp.asarray([12]), cfg)[0])
    assert abs(nll - loss) < 1e-4
    # padding must not change the masked NLL
    padded = np.zeros((1, 16), np.int64)
    padded[0, :12] = toks[0]
    nll_p = float(gpt2_nll(params, jnp.asarray(padded),
                           jnp.asarray([12]), cfg)[0])
    assert abs(nll_p - nll) < 1e-5


def test_gpt2_converter_strictness(hf_gpt2):
    model, cfg, _ = hf_gpt2
    sd = dict(model.state_dict())
    sd["transformer.h.0.bogus.weight"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unmapped"):
        convert_gpt2_state_dict(sd, cfg)


def test_gpt2_random_init_shapes():
    cfg = GPT2Config(vocab_size=50, n_positions=16, n_embd=16,
                     n_layer=1, n_head=2)
    params = init_gpt2_params(jax.random.PRNGKey(0), cfg)
    logits = gpt2_logits(params, jnp.zeros((1, 5), jnp.int32), cfg)
    assert logits.shape == (1, 5, 50)


def test_ppl_metric_end_to_end(tmp_path, hf_gpt2):
    from audiocodecs_tpu.downstream.metrics.external import (
        make_perplexity_metric,
    )
    from audiocodecs_tpu.utils.checkpoint import save_params

    model, cfg, params = hf_gpt2
    vocab, _ = _toy_tokenizer_files(tmp_path)
    assert len(vocab) <= cfg.vocab_size
    save_params(str(tmp_path / "gpt2.npz"), params)
    (tmp_path / "config.json").write_text(json.dumps({
        "vocab_size": cfg.vocab_size, "n_positions": cfg.n_positions,
        "n_embd": cfg.n_embd, "n_layer": cfg.n_layer, "n_head": cfg.n_head,
    }))
    stats = make_perplexity_metric(checkpoint=str(tmp_path / "gpt2.npz"),
                                   tokenizer_path=str(tmp_path))
    texts = ["the cat sat on the hat", "x", "that that the"]
    got = stats.metric(texts)
    # oracle: HF tokenizer + HF loss
    import transformers

    hf_tok = transformers.GPT2Tokenizer(str(tmp_path / "vocab.json"),
                                        str(tmp_path / "merges.txt"))
    for t, g in zip(texts, got):
        ids = torch.tensor([hf_tok.encode(t)])
        if ids.shape[-1] < 2:
            assert np.isnan(g)
            continue
        with torch.no_grad():
            want = float(torch.exp(model(ids, labels=ids).loss))
        assert abs(g - want) / want < 1e-3
