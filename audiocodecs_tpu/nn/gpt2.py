"""First-party GPT-2 causal LM in JAX (ASR-perplexity scorer).

The reference scores transcription quality with the perplexity of a
downloaded HF causal LM (default ``gpt2-large`` — reference
``downstream/metrics/perplexity.py:33-57``). This module implements the
GPT-2 architecture so a converted checkpoint
(:func:`audiocodecs_tpu.convert.gpt2.convert_gpt2_state_dict`) scores text
on-device with no torch at metric time.

TPU-first notes: the whole forward is one jitted stack of MXU matmuls over
a static ``[B, L]`` token block (callers bucket-pad lengths); pre-LN
blocks reuse the shared attention/linear/norm helpers
(:mod:`audiocodecs_tpu.nn.transformer`); the NLL reduction happens
in-graph so perplexity needs a single scalar fetch per batch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax import lax

from audiocodecs_tpu.nn.transformer import _linear, _norm, attention, causal_mask

__all__ = ["GPT2Config", "init_gpt2_params", "gpt2_logits", "gpt2_nll"]


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    """Mirrors the HF ``GPT2Config`` fields the forward needs."""

    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    norm_eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    # shared by the checkpoint converter and the metric's config.json
    # loader — one field map, one place
    _HF_FIELDS = {
        "vocab_size": "vocab_size",
        "n_positions": "n_positions",
        "n_embd": "n_embd",
        "n_layer": "n_layer",
        "n_head": "n_head",
        "norm_eps": "layer_norm_epsilon",
    }

    @classmethod
    def from_hf_dict(cls, d: dict) -> "GPT2Config":
        """Build from an HF ``config.json`` dict (KeyError on missing
        architecture fields; norm eps defaults like HF)."""
        kw = {ours: d[hf] for ours, hf in cls._HF_FIELDS.items()
              if ours != "norm_eps"}
        kw["norm_eps"] = d.get("layer_norm_epsilon", 1e-5)
        return cls(**kw)


def _gelu_new(x):
    """GPT-2's tanh-approximated GELU (HF ``gelu_new``)."""
    return jax.nn.gelu(x, approximate=True)


def init_gpt2_params(key, cfg: GPT2Config):
    D, F = cfg.n_embd, 4 * cfg.n_embd
    ks = iter(jax.random.split(key, 4 + 4 * cfg.n_layer))

    def lin(i, o):
        return {"w": jax.random.normal(next(ks), (i, o)) * 0.02,
                "b": jnp.zeros((o,))}

    def ln():
        return {"g": jnp.ones((D,)), "b": jnp.zeros((D,))}

    layers = [
        {"ln1": ln(), "attn": {"qkv": lin(D, 3 * D), "o": lin(D, D)},
         "ln2": ln(), "mlp": {"fc1": lin(D, F), "fc2": lin(F, D)}}
        for _ in range(cfg.n_layer)
    ]
    return {
        "wte": jax.random.normal(next(ks), (cfg.vocab_size, D)) * 0.02,
        "wpe": jax.random.normal(next(ks), (cfg.n_positions, D)) * 0.01,
        "layers": layers,
        "ln_f": ln(),
    }


def gpt2_logits(params, tokens: jax.Array, cfg: GPT2Config) -> jax.Array:
    """``tokens`` [B, L] → next-token logits [B, L, V] (tied LM head)."""
    B, L = tokens.shape
    Hd, Dd = cfg.n_head, cfg.head_dim
    x = jnp.take(params["wte"], tokens, axis=0) + params["wpe"][None, :L]
    mask = causal_mask(L, L)[None, None, None]
    for p in params["layers"]:
        h = _norm(x, p["ln1"], "layernorm", cfg.norm_eps)
        qkv = _linear(h, p["attn"]["qkv"]).reshape(B, L, 3, Hd, Dd)
        a = attention(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], mask=mask)
        x = x + _linear(a.reshape(B, L, Hd * Dd), p["attn"]["o"])
        h = _norm(x, p["ln2"], "layernorm", cfg.norm_eps)
        x = x + _linear(_gelu_new(_linear(h, p["mlp"]["fc1"])), p["mlp"]["fc2"])
    x = _norm(x, params["ln_f"], "layernorm", cfg.norm_eps)
    return jnp.einsum("bld,vd->blv", x, params["wte"],
                      precision=lax.Precision.HIGHEST)


def gpt2_nll(params, tokens: jax.Array, lengths: jax.Array,
             cfg: GPT2Config) -> jax.Array:
    """Mean next-token NLL per sequence (HF ``labels=input_ids`` loss).

    ``tokens`` [B, L] bucket-padded, ``lengths`` [B] true lengths; the
    loss averages over the ``lengths−1`` shifted positions, matching
    ``exp(loss)`` perplexity in the reference's torch path.
    """
    logits = gpt2_logits(params, tokens, cfg)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = tokens[:, 1:]
    tok_lp = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    pos = jnp.arange(tgt.shape[1])[None]
    valid = pos < (lengths[:, None] - 1)
    n = jnp.maximum(jnp.sum(valid, axis=1), 1)
    return -jnp.sum(jnp.where(valid, tok_lp, 0.0), axis=1) / n
