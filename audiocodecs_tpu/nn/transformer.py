"""Transformer blocks (pre-LN, RoPE, GQA, optional LayerScale / sliding window).

One implementation serves two consumers:
  * the Mimi codec's encoder/decoder transformers (LayerNorm + LayerScale +
    gelu MLP + sliding-window causal attention), and
  * the downstream Llama-3-style decoder (RMSNorm + SwiGLU + GQA) — the
    reference builds that from scratch in ``downstream/models/llama3.py``.

TPU-first: attention is batched einsum → MXU; softmax in float32; masks are
static trace-time constants for fixed sequence lengths; KV caching for
autoregressive decode uses a fixed-capacity ring buffer updated with
``lax.dynamic_update_slice`` (see ``downstream/models`` Llama decode loop).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["TransformerConfig", "apply_transformer", "rope_cos_sin",
           "attention", "init_transformer_params"]


@dataclasses.dataclass(frozen=True)
class TransformerConfig:
    hidden_size: int
    num_layers: int
    num_heads: int
    num_kv_heads: int
    head_dim: int
    intermediate_size: int
    act: str = "gelu"  # "gelu" | "swiglu"
    norm: str = "layernorm"  # "layernorm" | "rmsnorm"
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    use_layer_scale: bool = False
    sliding_window: Optional[int] = None
    attention_bias: bool = False
    causal: bool = True
    # Rematerialize each layer's activations in backward (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(layers) less HBM during training — the
    # standard TPU memory lever for deep stacks. Forward-only use is
    # unaffected (checkpoint is a no-op without a grad).
    remat: bool = False
    # Switch-MoE FFN: an audiocodecs_tpu.parallel.moe.MoEConfig replaces
    # the dense MLP with token-routed experts (params key "moe" instead of
    # "mlp"). Expert weights are stacked [E, ...]; shard them on a mesh
    # axis (parallel.moe.shard_moe_llama_params) and GSPMD partitions the
    # dispatch/expert/combine einsums over E — expert parallelism without
    # a hand-written shard_map.
    moe: Optional[object] = None


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float):
    """``positions`` [T] → (cos, sin) each [T, head_dim] (duplicated halves)."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """``x``: [B, T, H, D]; cos/sin: [T, D]."""
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    return x * cos + _rotate_half(x) * sin


def causal_mask(q_len: int, kv_len: int, sliding_window: Optional[int] = None):
    """Additive mask [q_len, kv_len]; 0 where attendable, −inf elsewhere."""
    q_pos = jnp.arange(q_len)[:, None] + (kv_len - q_len)
    k_pos = jnp.arange(kv_len)[None, :]
    ok = k_pos <= q_pos
    if sliding_window is not None:
        ok &= k_pos > q_pos - sliding_window
    return jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)


def attention(q, k, v, mask=None, scale=None):
    """``q``: [B, T, Hq, D], ``k``/``v``: [B, S, Hkv, D] → [B, T, Hq, D].

    GQA via head grouping; scores/softmax in float32.
    """
    B, T, Hq, D = q.shape
    S, Hkv = k.shape[1], k.shape[2]
    if scale is None:
        scale = 1.0 / (D**0.5)
    groups = Hq // Hkv
    qg = q.reshape(B, T, Hkv, groups, D)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, k, precision=lax.Precision.HIGHEST
    ).astype(jnp.float32) * scale
    if mask is not None:
        scores = scores + mask  # mask broadcasts over [B?, H, G, T, S]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgts,bshd->bthgd", probs, v,
                     precision=lax.Precision.HIGHEST)
    return out.reshape(B, T, Hq, D)


def _norm(x, p, kind: str, eps: float):
    if kind == "rmsnorm":
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        y = x * lax.rsqrt(var + eps).astype(x.dtype)
        return y * p["g"]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    y = (x - mean) * lax.rsqrt(var + eps)
    return y * p["g"] + p["b"]


def _linear(x, p):
    y = jnp.einsum("...i,io->...o", x, p["w"], precision=lax.Precision.HIGHEST)
    if "b" in p:
        y = y + p["b"]
    return y


def _mlp(x, p, act: str):
    if act == "swiglu":
        return _linear(jax.nn.silu(_linear(x, p["gate"])) * _linear(x, p["up"]),
                       p["down"])
    h = _linear(x, p["fc1"])
    h = jax.nn.gelu(h, approximate=False)
    return _linear(h, p["fc2"])


def _ffn_aux(x, p, cfg: "TransformerConfig"):
    """Layer FFN → (out, aux): dense MLP (aux = 0), or token-routed MoE
    when cfg.moe is set (routing over the flattened [B·T] token axis;
    aux = load-balancing loss of this layer's router)."""
    if cfg.moe is None:
        return _mlp(x, p["mlp"], cfg.act), jnp.zeros((), x.dtype)
    from audiocodecs_tpu.parallel.moe import moe_ffn_dense_aux

    B, T, D = x.shape
    out, aux = moe_ffn_dense_aux(p["moe"], x.reshape(B * T, D), cfg.moe)
    return out.reshape(B, T, D), aux


def _ffn(x, p, cfg: "TransformerConfig"):
    return _ffn_aux(x, p, cfg)[0]


def apply_layer(x, p, cfg: TransformerConfig, cos, sin, mask):
    return apply_layer_aux(x, p, cfg, cos, sin, mask)[0]


def apply_layer_aux(x, p, cfg: TransformerConfig, cos, sin, mask):
    """:func:`apply_layer` that also returns the layer's MoE aux loss
    (0 for dense FFNs) — used by training paths that add the Switch
    load-balancing term."""
    B, T, _ = x.shape
    h = _norm(x, p["ln1"], cfg.norm, cfg.norm_eps)
    q = _linear(h, p["q"]).reshape(B, T, cfg.num_heads, cfg.head_dim)
    k = _linear(h, p["k"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    v = _linear(h, p["v"]).reshape(B, T, cfg.num_kv_heads, cfg.head_dim)
    q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
    a = attention(q, k, v, mask)
    a = _linear(a.reshape(B, T, cfg.num_heads * cfg.head_dim), p["o"])
    if cfg.use_layer_scale:
        a = a * p["scale_attn"]
    x = x + a
    h = _norm(x, p["ln2"], cfg.norm, cfg.norm_eps)
    m, aux = _ffn_aux(h, p, cfg)
    if cfg.use_layer_scale:
        m = m * p["scale_mlp"]
    return x + m, aux


def apply_transformer(params, x: jax.Array, cfg: TransformerConfig,
                      positions: Optional[jax.Array] = None,
                      return_aux: bool = False):
    """``x``: [B, T, hidden] → [B, T, hidden]. ``params``: {"layers": [...],
    optional "final_norm"}. ``return_aux=True`` additionally returns the
    summed MoE load-balancing aux loss over layers (0 for dense stacks)."""
    T = x.shape[1]
    if positions is None:
        positions = jnp.arange(T)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    mask = (
        causal_mask(T, T, cfg.sliding_window)[None, None, None]
        if cfg.causal
        else None
    )
    base = apply_layer_aux if return_aux else apply_layer
    layer = (jax.checkpoint(base, static_argnums=(2,))
             if cfg.remat else base)
    aux = jnp.zeros((), x.dtype)
    for p in params["layers"]:
        if return_aux:
            x, a = layer(x, p, cfg, cos, sin, mask)
            aux = aux + a
        else:
            x = layer(x, p, cfg, cos, sin, mask)
    if "final_norm" in params:
        x = _norm(x, params["final_norm"], cfg.norm, cfg.norm_eps)
    return (x, aux) if return_aux else x


def init_transformer_params(key, cfg: TransformerConfig):
    def lin(key, i, o, bias):
        p = {"w": jax.random.normal(key, (i, o)) * (i**-0.5)}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    def norm_p():
        p = {"g": jnp.ones((cfg.hidden_size,))}
        if cfg.norm == "layernorm":
            p["b"] = jnp.zeros((cfg.hidden_size,))
        return p

    layers = []
    H, D = cfg.hidden_size, cfg.head_dim
    for _ in range(cfg.num_layers):
        keys = jax.random.split(key, 8)
        key = keys[-1]
        p = {
            "ln1": norm_p(),
            "q": lin(keys[0], H, cfg.num_heads * D, cfg.attention_bias),
            "k": lin(keys[1], H, cfg.num_kv_heads * D, cfg.attention_bias),
            "v": lin(keys[2], H, cfg.num_kv_heads * D, cfg.attention_bias),
            "o": lin(keys[3], cfg.num_heads * D, H, cfg.attention_bias),
            "ln2": norm_p(),
        }
        if cfg.moe is not None:
            from audiocodecs_tpu.parallel.moe import init_moe_params

            p["moe"] = init_moe_params(keys[4], cfg.moe)
        elif cfg.act == "swiglu":
            p["mlp"] = {
                "gate": lin(keys[4], H, cfg.intermediate_size, False),
                "up": lin(keys[5], H, cfg.intermediate_size, False),
                "down": lin(keys[6], cfg.intermediate_size, H, False),
            }
        else:
            p["mlp"] = {
                "fc1": lin(keys[4], H, cfg.intermediate_size, False),
                "fc2": lin(keys[5], cfg.intermediate_size, H, False),
            }
        if cfg.use_layer_scale:
            p["scale_attn"] = jnp.full((H,), 0.01)
            p["scale_mlp"] = jnp.full((H,), 0.01)
        layers.append(p)
    return {"layers": layers}
