"""Llama-3-style decoder for generative speech tasks (SLM/TTS), TPU-native.

Capability parity with the reference's from-scratch torch decoder
(reference ``downstream/models/llama3.py``: RMSNorm ``:35``, SwiGLU ``:74``,
GQA ``:112``, RoPE ``:257-274``, growable KV cache ``:198-214``, multi-codebook
interleaved embedding ``:511-524``, per-codebook heads ``:590-611``,
autoregressive ``generate`` ``:816-983``) — re-designed for XLA:

  * the transformer body is the shared block library
    (:mod:`audiocodecs_tpu.nn.transformer`) with ``rmsnorm`` + ``swiglu``;
  * the KV cache is a **fixed-capacity buffer** written with
    ``lax.dynamic_update_slice`` (no growable tensors under jit — replaces
    the reference's amortized-doubling cache);
  * generation is one ``lax.scan`` over decode steps with an alive-mask for
    per-sequence EOS early exit (compiler-friendly; no Python loop);
  * multi-codebook token grids are flattened K-interleaved; embedding uses
    the fused offset table and the output head is one fused matmul with the
    per-position codebook selected by gather.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from audiocodecs_tpu.downstream.models.multihead import (
    init_multihead_linear,
    multihead_logits,
)
from audiocodecs_tpu.nn.transformer import (
    TransformerConfig,
    _ffn,
    _linear,
    _norm,
    apply_rope,
    apply_transformer,
    attention,
    causal_mask,
    init_transformer_params,
    rope_cos_sin,
)

__all__ = ["LlamaConfig", "init_llama_params", "llama_forward", "llama_embed",
           "llama_generate", "init_kv_cache"]


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 1024
    num_codebooks: int = 1
    hidden_size: int = 512
    num_layers: int = 6
    num_heads: int = 8
    num_kv_heads: int = 4
    intermediate_size: int = 1408
    max_seq_len: int = 2048
    rope_theta: float = 500000.0
    norm_eps: float = 1e-5
    # special tokens appended after the K*C content rows
    # (bos = C*K, eos = C*K+1, pad = C*K+2 in the flat vocab)
    num_special: int = 3
    # per-layer activation rematerialization for training (HBM ↓, FLOPs ↑)
    remat: bool = False
    # Switch-MoE FFN (beyond-reference): moe_experts > 0 replaces every
    # layer's SwiGLU MLP with token-routed experts of width moe_ffn_size
    # (default: intermediate_size). Expert weights stack [E, ...] — shard
    # them on the model mesh axis (parallel.moe.shard_moe_llama_params)
    # for expert parallelism.
    moe_experts: int = 0
    moe_ffn_size: int = 0
    moe_capacity_factor: float = 2.0
    # routing: 1 = switch top-1; 2 = GShard top-2 (renormalized gates)
    moe_top_k: int = 1
    # Switch load-balancing aux-loss weight (0 = off; paper default 1e-2).
    # Training paths add moe_aux_weight · aux via llama_forward(return_aux=)
    moe_aux_weight: float = 0.0

    def transformer(self) -> TransformerConfig:
        head_dim = self.hidden_size // self.num_heads
        moe = None
        if self.moe_experts > 0:
            from audiocodecs_tpu.parallel.moe import MoEConfig

            moe = MoEConfig(
                hidden_size=self.hidden_size,
                ffn_size=self.moe_ffn_size or self.intermediate_size,
                num_experts=self.moe_experts,
                capacity_factor=self.moe_capacity_factor,
                top_k=self.moe_top_k,
                aux_weight=self.moe_aux_weight,
            )
        return TransformerConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_layers,
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            head_dim=head_dim,
            intermediate_size=self.intermediate_size,
            act="swiglu",
            norm="rmsnorm",
            norm_eps=self.norm_eps,
            rope_theta=self.rope_theta,
            causal=True,
            remat=self.remat,
            moe=moe,
        )

    @property
    def flat_vocab(self) -> int:
        """Rows in the embedding table: K·C content + special tokens."""
        return self.num_codebooks * self.vocab_size + self.num_special

    @property
    def head_vocab(self) -> int:
        """Per-codebook head width: content vocab + special logits (so EOS
        is trainable/generatable — reference heads include specials too)."""
        return self.vocab_size + self.num_special

    @property
    def bos_token(self) -> int:
        return self.num_codebooks * self.vocab_size

    @property
    def eos_token(self) -> int:
        return self.num_codebooks * self.vocab_size + 1

    @property
    def pad_token(self) -> int:
        return self.num_codebooks * self.vocab_size + 2


def init_llama_params(key, cfg: LlamaConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    body = init_transformer_params(k1, cfg.transformer())
    body["final_norm"] = {"g": jnp.ones((cfg.hidden_size,))}
    return {
        "body": body,
        "embedding": {
            "table": jax.random.normal(k2, (cfg.flat_vocab, cfg.hidden_size)) * 0.02
        },
        "head": init_multihead_linear(
            k3, cfg.hidden_size, cfg.num_codebooks, cfg.head_vocab, bias=False
        ),
    }


def llama_embed(params, flat_toks: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """K-interleaved flat tokens ``[B, L]`` → embeddings ``[B, L, H]``.

    The SLM/TTS layout is ``[BOS, f0c0, f0c1, ..., f0c(K-1), f1c0, ...]``
    (BOS at a position ≡ 0 mod K), so content position ``p`` holds
    codebook ``(p−1) % K`` and reads embedding row ``tok + ((p−1)%K)·C``
    — the band index IS the codebook, which is what the default-on
    ``pretrain_embeddings`` seeding from ``codec.embs()`` assumes
    (reference interleaving, ``llama3.py:511-524``). Special tokens
    (≥ K·C in flat space) read their own rows directly.
    """
    B, L = flat_toks.shape
    K, C = cfg.num_codebooks, cfg.vocab_size
    cb = ((jnp.arange(L) - 1) % K).astype(flat_toks.dtype)
    is_special = flat_toks >= K * C
    idx = jnp.where(is_special, flat_toks, flat_toks + cb[None] * C)
    return jnp.take(params["embedding"]["table"], idx, axis=0)


def llama_forward(params, embs: jax.Array, cfg: LlamaConfig,
                  positions: Optional[jax.Array] = None,
                  return_aux: bool = False):
    """Embeddings ``[B, L, H]`` → per-codebook logits ``[B, L, K, C]``.

    ``return_aux=True`` also returns the summed MoE load-balancing aux
    loss over layers (0 for dense models) for training objectives."""
    if return_aux:
        h, aux = apply_transformer(params["body"], embs, cfg.transformer(),
                                   positions, return_aux=True)
        logits = multihead_logits(params["head"], h,
                                  num_heads=cfg.num_codebooks)
        return logits, aux
    h = apply_transformer(params["body"], embs, cfg.transformer(), positions)
    return multihead_logits(params["head"], h, num_heads=cfg.num_codebooks)


# --------------------------------------------------------------------- #
# KV-cached autoregressive generation
# --------------------------------------------------------------------- #


def init_kv_cache(cfg: LlamaConfig, batch: int, capacity: int, dtype=jnp.float32):
    t = cfg.transformer()
    shape = (t.num_layers, batch, capacity, t.num_kv_heads, t.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def _layer_step(x, p, t: TransformerConfig, cos, sin, k_cache, v_cache, pos,
                capacity):
    """One decode step through one layer. ``x``: [B, 1, H]; caches [B, S, Hkv, D]."""
    B = x.shape[0]
    h = _norm(x, p["ln1"], t.norm, t.norm_eps)
    q = _linear(h, p["q"]).reshape(B, 1, t.num_heads, t.head_dim)
    k = _linear(h, p["k"]).reshape(B, 1, t.num_kv_heads, t.head_dim)
    v = _linear(h, p["v"]).reshape(B, 1, t.num_kv_heads, t.head_dim)
    q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    k_cache = lax.dynamic_update_slice(k_cache, k, (0, pos, 0, 0))
    v_cache = lax.dynamic_update_slice(v_cache, v, (0, pos, 0, 0))
    valid = (jnp.arange(capacity) <= pos)[None, None, None, None, :]
    mask = jnp.where(valid, 0.0, -jnp.inf).astype(jnp.float32)
    a = attention(q, k_cache, v_cache, mask)
    a = _linear(a.reshape(B, 1, t.num_heads * t.head_dim), p["o"])
    x = x + a
    h = _norm(x, p["ln2"], t.norm, t.norm_eps)
    return x + _ffn(h, p, t), k_cache, v_cache


def _decode_one(params, cfg: LlamaConfig, tok_emb, cache, pos, capacity):
    """tok_emb [B, 1, H], absolute position ``pos`` → (logits [B, K, C], cache)."""
    t = cfg.transformer()
    cos, sin = rope_cos_sin(jnp.atleast_1d(jnp.asarray(pos)), t.head_dim,
                            t.rope_theta)
    x = tok_emb
    new_k, new_v = [], []
    for li, p in enumerate(params["body"]["layers"]):
        x, kc, vc = _layer_step(
            x, p, t, cos, sin, cache["k"][li], cache["v"][li], pos, capacity
        )
        new_k.append(kc)
        new_v.append(vc)
    cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    x = _norm(x, params["body"]["final_norm"], t.norm, t.norm_eps)
    logits = multihead_logits(params["head"], x[:, 0], num_heads=cfg.num_codebooks)
    return logits, cache


def _prefill(params, cfg: LlamaConfig, flat_toks, cache, capacity,
             prompt_emb_add=None):
    """Run the prompt through the model, filling the cache; returns last logits."""
    t = cfg.transformer()
    B, L = flat_toks.shape
    embs = llama_embed(params, flat_toks, cfg)
    if prompt_emb_add is not None:
        embs = embs + prompt_emb_add
    positions = jnp.arange(L)
    cos, sin = rope_cos_sin(positions, t.head_dim, t.rope_theta)
    mask = causal_mask(L, L)[None, None, None]
    x = embs
    new_k, new_v = [], []
    for li, p in enumerate(params["body"]["layers"]):
        h = _norm(x, p["ln1"], t.norm, t.norm_eps)
        q = _linear(h, p["q"]).reshape(B, L, t.num_heads, t.head_dim)
        k = _linear(h, p["k"]).reshape(B, L, t.num_kv_heads, t.head_dim)
        v = _linear(h, p["v"]).reshape(B, L, t.num_kv_heads, t.head_dim)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        a = attention(q, k, v, mask)
        a = _linear(a.reshape(B, L, t.num_heads * t.head_dim), p["o"])
        x = x + a
        h = _norm(x, p["ln2"], t.norm, t.norm_eps)
        x = x + _ffn(h, p, t)
        kc = lax.dynamic_update_slice(
            cache["k"][li], k, (0, 0, 0, 0)
        )
        vc = lax.dynamic_update_slice(cache["v"][li], v, (0, 0, 0, 0))
        new_k.append(kc)
        new_v.append(vc)
    cache = {"k": jnp.stack(new_k), "v": jnp.stack(new_v)}
    x = _norm(x, params["body"]["final_norm"], t.norm, t.norm_eps)
    logits = multihead_logits(params["head"], x[:, -1], num_heads=cfg.num_codebooks)
    return logits, cache


def _sample_top_p(key, logits, top_p: float):
    """Nucleus sampling over the last axis."""
    probs = jax.nn.softmax(logits, axis=-1)
    order = jnp.argsort(-probs, axis=-1)
    sp = jnp.take_along_axis(probs, order, axis=-1)
    csum = jnp.cumsum(sp, axis=-1)
    keep_sorted = (csum - sp) <= top_p
    inv = jnp.argsort(order, axis=-1)
    keep = jnp.take_along_axis(keep_sorted, inv, axis=-1)
    filtered = jnp.where(keep, logits, -jnp.inf)
    return jax.random.categorical(key, filtered, axis=-1)


def llama_generate(
    params,
    cfg: LlamaConfig,
    prompt_flat_toks: jax.Array,
    max_gen_toks: int,
    key: jax.Array,
    top_p: Optional[float] = None,
    temperature: float = 1.0,
    prompt_emb_add: Optional[jax.Array] = None,
):
    """Autoregressive generation (greedy or nucleus).

    ``top_p`` None or 0.0 → greedy; otherwise temperature-scaled nucleus
    sampling (reference ``llama3.py:817-983``).

    ``prompt_flat_toks``: [B, L] K-interleaved flat tokens (with BOS).
    ``prompt_emb_add``: optional [B, L, H] (or broadcastable) additive
    conditioning on the prompt embeddings — used by the TTS recipe to inject
    the speaker embedding the same way training does.
    Returns (tokens [B, max_gen_toks], alive_lengths [B]). Generation per
    sequence halts at EOS via an alive mask; the scan itself is fixed-length
    (XLA-friendly; equivalent to reference ``llama3.py:920-983``).
    """
    B, L = prompt_flat_toks.shape
    K = cfg.num_codebooks
    capacity = L + max_gen_toks
    cache = init_kv_cache(cfg, B, capacity)
    logits, cache = _prefill(params, cfg, prompt_flat_toks, cache, capacity,
                             prompt_emb_add)

    def step(carry, i):
        cache, last_logits, alive, prev_tok, key = carry
        key, k1 = jax.random.split(key)
        # Head convention must match training: the hidden state at position
        # p−1 predicts position p through head (p−1) % K (see the recipes'
        # nll) — which is also the codebook (and embedding band) of the
        # content at position p under the [BOS, content...] layout.
        cb_head = (L + i - 1) % K
        cb = cb_head  # embedding band == codebook of the generated position
        lg = jnp.take(last_logits, cb_head, axis=1)  # [B, head_vocab]
        if top_p is None or top_p == 0.0:
            tok = jnp.argmax(lg, axis=-1)
        else:
            tok = _sample_top_p(k1, lg / max(temperature, 1e-6), top_p)
        tok = tok.astype(jnp.int32)
        # head ids >= C are specials → map into flat special space
        tok = jnp.where(tok >= cfg.vocab_size,
                        K * cfg.vocab_size + (tok - cfg.vocab_size), tok)
        tok = jnp.where(alive, tok, cfg.pad_token)
        # embed with the right codebook offset: content rows read tok + cb·C
        emb = jnp.take(
            params["embedding"]["table"],
            jnp.where(tok >= K * cfg.vocab_size, tok, tok + cb * cfg.vocab_size),
            axis=0,
        )[:, None]
        new_logits, cache = _decode_one(params, cfg, emb, cache, L + i, capacity)
        alive = alive & (tok != cfg.eos_token)
        return (cache, new_logits, alive, tok, key), tok

    alive0 = jnp.ones((B,), bool)
    (_, _, alive, _, _), toks = lax.scan(
        step,
        (cache, logits, alive0, jnp.zeros((B,), jnp.int32), key),
        jnp.arange(max_gen_toks),
    )
    toks = jnp.swapaxes(toks, 0, 1)  # [B, max_gen_toks]
    lengths = jnp.sum(
        jnp.cumprod((toks != cfg.eos_token).astype(jnp.int32), axis=1), axis=1
    )
    return toks, lengths
