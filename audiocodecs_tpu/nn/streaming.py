"""Streaming (chunked-causal) primitives: convs, transposed convs,
transformers with carried state.

The reference's streaming codecs (Mimi / FocalCodec-Stream / PAST-streamable,
SURVEY §5.7) process audio in chunks with carried left context. Here state is
an explicit pytree threaded through pure functions — the idiomatic JAX shape
for scan/stream loops:

  * causal conv: state = last ``padding_total`` input samples (the upstream
    ``MimiConv1dPaddingCache`` role);
  * causal transposed conv (trim_right_ratio=1): state = the ``K−stride``
    output-tail overlap, added into the next chunk's head (bias applied after
    overlap-add so it isn't double-counted);
  * transformer: state = per-layer rolling K/V window of the last
    ``window`` positions plus their absolute positions (sliding-window
    causal attention continues seamlessly across chunks).

Chunk lengths must be multiples of the layer stride (no frame-boundary
repadding mid-stream).
"""

from __future__ import annotations

from typing import Optional


import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import conv1d, conv_transpose1d
from audiocodecs_tpu.nn.transformer import (
    TransformerConfig,
    _linear,
    _mlp,
    _norm,
    apply_rope,
    attention,
    rope_cos_sin,
)

__all__ = [
    "conv_stream",
    "convtr_stream",
    "init_conv_state",
    "init_convtr_state",
    "init_transformer_stream_state",
    "apply_transformer_streaming",
]


def init_conv_state(batch: int, kernel: int, stride: int, cin: int,
                    dilation: int = 1, dtype=jnp.float32):
    eff_k = (kernel - 1) * dilation + 1
    return jnp.zeros((batch, eff_k - stride, cin), dtype)


def conv_stream(x, state, w, b=None, *, stride: int = 1, dilation: int = 1):
    """Causal conv over one chunk. ``x``: [B, L, Cin] with L % stride == 0."""
    xc = jnp.concatenate([state, x], axis=1)
    y = conv1d(xc, w, b, stride=stride, dilation=dilation)
    ctx = state.shape[1]
    new_state = xc[:, xc.shape[1] - ctx:] if ctx else state
    return y, new_state


def init_convtr_state(batch: int, kernel: int, stride: int, cout: int,
                      dtype=jnp.float32):
    return jnp.zeros((batch, kernel - stride, cout), dtype)


def convtr_stream(x, state, w, b=None, *, stride: int, groups: int = 1):
    """Causal transposed conv over one chunk (full right-trim).

    ``x``: [B, L, Cin] → y [B, L·stride, Cout]; carries the K−stride output
    tail into the next chunk.
    """
    k = w.shape[0]
    L = x.shape[1]
    y_full = conv_transpose1d(x, w, None, stride=stride, groups=groups)
    # full length = (L-1)*stride + k = L*stride + (k - stride)
    main = y_full[:, : L * stride]
    tail = y_full[:, L * stride:]
    overlap = state.shape[1]
    if overlap:
        main = main.at[:, :overlap].add(state)
    if b is not None:
        main = main + b
    return main, tail


def init_transformer_stream_state(cfg: TransformerConfig, batch: int,
                                  window: Optional[int] = None,
                                  dtype=jnp.float32):
    W = window or cfg.sliding_window or 512
    shape = (cfg.num_layers, batch, W, cfg.num_kv_heads, cfg.head_dim)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "slot_pos": jnp.full((W,), -1, jnp.int32),  # absolute positions
        "pos": jnp.zeros((), jnp.int32),  # next absolute position
    }


def apply_transformer_streaming(params, x, cfg: TransformerConfig, state):
    """Process one chunk ``[B, L, H]`` with rolling sliding-window KV state."""
    B, L, _ = x.shape
    W = state["k"].shape[2]
    pos0 = state["pos"]
    positions = pos0 + jnp.arange(L)
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)

    q_pos = positions[:, None]  # [L, 1]
    cache_pos = state["slot_pos"][None, :]  # [1, W]
    cur_pos = positions[None, :]  # [1, L]
    kv_pos = jnp.concatenate(
        [jnp.broadcast_to(cache_pos, (L, W)),
         jnp.broadcast_to(cur_pos, (L, L))], axis=1
    )  # [L, W+L]
    ok = (kv_pos >= 0) & (kv_pos <= q_pos)
    if cfg.sliding_window is not None:
        ok &= kv_pos > q_pos - cfg.sliding_window
    mask = jnp.where(ok, 0.0, -jnp.inf).astype(jnp.float32)[None, None, None]

    new_k, new_v = [], []
    for li, p in enumerate(params["layers"]):
        h = _norm(x, p["ln1"], cfg.norm, cfg.norm_eps)
        q = _linear(h, p["q"]).reshape(B, L, cfg.num_heads, cfg.head_dim)
        k = _linear(h, p["k"]).reshape(B, L, cfg.num_kv_heads, cfg.head_dim)
        v = _linear(h, p["v"]).reshape(B, L, cfg.num_kv_heads, cfg.head_dim)
        q, k = apply_rope(q, cos, sin), apply_rope(k, cos, sin)
        k_all = jnp.concatenate([state["k"][li], k], axis=1)  # [B, W+L, ...]
        v_all = jnp.concatenate([state["v"][li], v], axis=1)
        a = attention(q, k_all, v_all, mask)
        a = _linear(a.reshape(B, L, cfg.num_heads * cfg.head_dim), p["o"])
        if cfg.use_layer_scale:
            a = a * p["scale_attn"]
        x = x + a
        h = _norm(x, p["ln2"], cfg.norm, cfg.norm_eps)
        m = _mlp(h, p["mlp"], cfg.act)
        if cfg.use_layer_scale:
            m = m * p["scale_mlp"]
        x = x + m
        new_k.append(k_all[:, -W:])
        new_v.append(v_all[:, -W:])

    all_pos = jnp.concatenate([state["slot_pos"], positions.astype(jnp.int32)])
    new_state = {
        "k": jnp.stack(new_k),
        "v": jnp.stack(new_v),
        "slot_pos": all_pos[-W:],
        "pos": pos0 + L,
    }
    if "final_norm" in params:
        x = _norm(x, params["final_norm"], cfg.norm, cfg.norm_eps)
    return x, new_state
