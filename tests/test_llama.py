"""Downstream decoder tests (mirrors the reference's llama3 self-tests:
incremental-vs-fresh decode consistency, gradient existence, generation —
reference ``downstream/models/llama3.py:999-1236``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.models.llama import (
    LlamaConfig,
    init_kv_cache,
    llama_embed,
    llama_forward,
    llama_generate,
    _decode_one,
    _prefill,
)
from audiocodecs_tpu.downstream.models.multihead import (
    init_multihead_embedding,
    init_multihead_linear,
    multihead_embed,
    multihead_logits,
)
from audiocodecs_tpu.downstream.models.pooling import (
    attentional_pooling,
    init_attentional_pooling,
    init_linear_pooling,
    init_weighted_pooling,
    linear_pooling,
    weighted_pooling,
)
from audiocodecs_tpu.downstream.models.llama import init_llama_params

CFG = LlamaConfig(
    vocab_size=17, num_codebooks=2, hidden_size=32, num_layers=2,
    num_heads=4, num_kv_heads=2, intermediate_size=64, max_seq_len=64,
)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(0), CFG)


def test_forward_shapes(params):
    toks = jnp.zeros((2, 6), jnp.int32)
    logits = llama_forward(params, llama_embed(params, toks, CFG), CFG)
    assert logits.shape == (2, 6, CFG.num_codebooks, CFG.head_vocab)


def test_incremental_matches_fresh(params, rng):
    """KV-cached step-by-step decode == full forward (reference jit-parity
    style test)."""
    L = 7
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, L)), jnp.int32)
    full = llama_forward(params, llama_embed(params, toks, CFG), CFG)

    cache = init_kv_cache(CFG, 2, L)
    logits0, cache = _prefill(params, CFG, toks[:, :3], cache, L)
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(full[:, 2]),
                               atol=1e-5, rtol=1e-5)
    # continue one token at a time
    for pos in range(3, L):
        cb = (pos - 1) % CFG.num_codebooks
        tok = toks[:, pos]
        emb = jnp.take(
            params["embedding"]["table"], tok + cb * CFG.vocab_size, axis=0
        )[:, None]
        logits, cache = _decode_one(params, CFG, emb, cache, pos, L)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, pos]), atol=2e-5, rtol=1e-4
        )


def test_gradients_exist(params, rng):
    toks = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 6)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, CFG.vocab_size, (2, 6)), jnp.int32)

    def loss(p):
        logits = llama_forward(p, llama_embed(p, toks, CFG), CFG)
        cb = (jnp.arange(6) % CFG.num_codebooks)[None]
        lg = jnp.take_along_axis(
            logits, cb[..., None, None].astype(jnp.int32), axis=2
        )[:, :, 0]
        oh = jax.nn.one_hot(tgt, CFG.head_vocab)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(lg) * oh, -1))

    grads = jax.grad(loss)(params)
    norms = [float(jnp.abs(g).sum()) for g in jax.tree.leaves(grads)]
    assert all(np.isfinite(norms))
    assert sum(n > 0 for n in norms) > len(norms) * 0.9


def test_generation(params):
    prompt = jnp.full((2, 2), CFG.bos_token, jnp.int32)
    toks, lengths = jax.jit(
        lambda p, pr, k: llama_generate(p, CFG, pr, 8, k, top_p=0.9)
    )(params, prompt, jax.random.PRNGKey(1))
    assert toks.shape == (2, 8)
    assert (np.asarray(toks) >= 0).all()
    greedy, _ = llama_generate(params, CFG, prompt, 8, jax.random.PRNGKey(2))
    assert greedy.shape == (2, 8)


def test_multihead_layers(rng):
    key = jax.random.PRNGKey(0)
    emb = init_multihead_embedding(key, 3, 11, 8, pad_row=True)
    toks = jnp.asarray(rng.integers(0, 11, (2, 5, 3)), jnp.int32)
    out = multihead_embed(emb, toks, vocab_size=11)
    assert out.shape == (2, 5, 3, 8)
    lin = init_multihead_linear(key, 8, 3, 11)
    logits = multihead_logits(lin, out.mean(2), num_heads=3)
    assert logits.shape == (2, 5, 3, 11)


def test_pooling_layers(rng):
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.standard_normal((2, 5, 3, 8)), jnp.float32)
    a = attentional_pooling(init_attentional_pooling(key, 8), x)
    l = linear_pooling(init_linear_pooling(key, 3), x)
    w = weighted_pooling(init_weighted_pooling(key, 3), x)
    assert a.shape == l.shape == w.shape == (2, 5, 8)
    # weighted pooling with uniform logits == mean over K
    np.testing.assert_allclose(np.asarray(w), np.asarray(x.mean(2)), atol=1e-6)


def test_remat_grads_match():
    """jax.checkpoint remat must be a pure memory/FLOP trade: loss and
    grads identical to the non-remat path."""
    import dataclasses

    import optax

    from audiocodecs_tpu.downstream.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_embed,
        llama_forward,
    )

    lcfg = LlamaConfig(vocab_size=8, num_codebooks=2, hidden_size=16,
                       num_layers=2, num_heads=2, num_kv_heads=1,
                       intermediate_size=32)
    params = init_llama_params(jax.random.PRNGKey(0), lcfg)
    rng = np.random.default_rng(0)
    flat = jnp.asarray(rng.integers(0, 8, (2, 6)), jnp.int32)

    def loss(cfg_variant):
        def f(p):
            logits = llama_forward(p, llama_embed(p, flat, cfg_variant),
                                   cfg_variant)
            return jnp.sum(jax.nn.log_softmax(logits) ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(lcfg))(params)
    lc = dataclasses.replace(lcfg, remat=True)
    l1, g1 = jax.value_and_grad(loss(lc))(params)
    assert float(l0) == float(l1)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_embed_band_is_the_content_codebook():
    """Under the [BOS, f0c0, f0c1, ...] layout, content position p holds
    codebook (p−1)%K and must read embedding band (p−1)%K — the alignment
    the pretrain_embeddings seeding (table[:K·C] = codec.embs()) assumes.
    Regression for the off-by-one band rotation (review finding)."""
    from audiocodecs_tpu.downstream.models.llama import (
        init_llama_params,
        llama_embed,
    )

    K, C = CFG.num_codebooks, CFG.vocab_size
    p = init_llama_params(jax.random.PRNGKey(0), CFG)
    table = np.asarray(p["embedding"]["table"])
    flat = jnp.asarray([[CFG.bos_token, 3, 5, 7, 2]], jnp.int32)
    embs = np.asarray(llama_embed(p, flat, CFG))
    for p, tok in [(1, 3), (2, 5), (3, 7), (4, 2)]:
        band = (p - 1) % K
        np.testing.assert_array_equal(embs[0, p], table[tok + band * C])
