"""Multi-layer LSTM via ``lax.scan``, matching PyTorch ``nn.LSTM`` numerics.

TPU-first formulation: the input projection for the *entire* sequence is one
large matmul (``[B·T, Cin] @ [Cin, 4H]`` — MXU-shaped), leaving only the
``[B, H] @ [H, 4H]`` recurrent matmul inside the scan body. Gate order is
PyTorch's ``(i, f, g, o)`` so converted checkpoints (EnCodec bottleneck LSTM,
reference-cited HF ``EncodecLSTM``) are bit-compatible; the two bias vectors
are summed at conversion time.

Params per layer: ``{"w_ih": [Cin, 4H], "w_hh": [H, 4H], "b": [4H]}``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["lstm", "lstm_cell_step", "init_lstm_params"]


def _pallas_enabled(hidden: int) -> bool:
    """Use the fused Pallas recurrence on TPU (overridable via
    ``ACX_PALLAS_LSTM=0/1``); requires lane-aligned hidden size.

    The kernel keeps ``w_hh`` [H, 4H] resident in VMEM for the whole
    sequence; past H=768 that footprint (16·H² bytes ≈ 16 MB at H=1024)
    exceeds Mosaic's 16 MB *default* scoped-VMEM budget (hit by
    SpeechTokenizer's 1024-wide BiLSTM), so auto mode falls back to
    ``lax.scan`` there. ``ACX_PALLAS_LSTM_WIDE=1`` extends the cap to
    H=1536 (w_hh 37.7 MB): the kernel then raises ``vmem_limit_bytes``
    toward v5e's 128 MB physical VMEM. ``ACX_PALLAS_LSTM_WIDE=decoder``
    extends the cap only inside a ``conv_role("decoder")`` scope: the
    kernel's f32 accumulation order differs from the HIGHEST-precision
    ``lax.scan`` recurrence just enough to flip ~0.1% of argmin-marginal
    tokens when used on an ENCODER bottleneck (BigCodec measured
    token_match 0.9991, BENCH_NOTES round 5), while decode-side LSTMs
    sit past the quantizer and cannot affect tokens — there the wide
    kernel is 2.6x faster than the scan (22.0 vs 57.8 ms per 2-layer
    H=1536 stack @B4x800)."""
    import os

    v = os.environ.get("ACX_PALLAS_LSTM", "auto")
    if v == "0":
        return False
    if v == "1":
        return True
    wide = os.environ.get("ACX_PALLAS_LSTM_WIDE", "0")
    if wide == "decoder":
        from audiocodecs_tpu.nn import layers

        wide = "1" if layers._CONV_ROLE == "decoder" else "0"
    cap = 1536 if wide == "1" else 768
    return (jax.default_backend() == "tpu" and hidden % 128 == 0
            and hidden <= cap)


def _layer(x: jax.Array, p, h0=None, c0=None):
    """One LSTM layer. ``x``: [B, T, Cin] → [B, T, H]."""
    B, T, _ = x.shape
    H = p["w_hh"].shape[0]
    # All-timestep input projection: one MXU matmul.
    gates_x = (
        jnp.einsum("btc,ch->bth", x, p["w_ih"], precision=lax.Precision.HIGHEST)
        + p["b"]
    )
    h = jnp.zeros((B, H), x.dtype) if h0 is None else h0
    c = jnp.zeros((B, H), x.dtype) if c0 is None else c0

    if _pallas_enabled(H):
        from audiocodecs_tpu.ops.lstm_pallas import lstm_layer_pallas

        ys, h, c = lstm_layer_pallas(
            jnp.swapaxes(gates_x, 0, 1), p["w_hh"], h, c
        )
        return jnp.swapaxes(ys, 0, 1), (h, c)

    def step(carry, gx):
        h, c = carry
        h, c = lstm_cell_step(gx, h, c, p["w_hh"])
        return (h, c), h

    (h, c), ys = lax.scan(step, (h, c), jnp.swapaxes(gates_x, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (h, c)


def lstm_cell_step(gates_x: jax.Array, h: jax.Array, c: jax.Array, w_hh: jax.Array):
    """One recurrence step. ``gates_x``: [B, 4H] (input projection + bias)."""
    gates = gates_x + jnp.dot(h, w_hh, precision=lax.Precision.HIGHEST)
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c = f * c + i * g
    h = o * jnp.tanh(c)
    return h, c


def lstm(x: jax.Array, params: list, state=None):
    """Stacked LSTM. ``x``: [B, T, C] → ([B, T, H], per-layer (h, c) states).

    ``state`` is an optional list of per-layer ``(h, c)`` carries for
    streaming/chunked execution.
    """
    new_state = []
    for li, p in enumerate(params):
        h0c0 = state[li] if state is not None else (None, None)
        x, hc = _layer(x, p, *h0c0)
        new_state.append(hc)
    return x, new_state


def bilstm(x: jax.Array, params: list):
    """Bidirectional stacked LSTM → [B, T, 2H].

    ``params``: list of per-layer ``{"fwd": {...}, "bwd": {...}}`` dicts
    (PyTorch ``bidirectional=True`` layout: layer l>0 consumes 2H inputs).
    """
    for p in params:
        fwd, _ = _layer(x, p["fwd"])
        bwd, _ = _layer(jnp.flip(x, axis=1), p["bwd"])
        x = jnp.concatenate([fwd, jnp.flip(bwd, axis=1)], axis=-1)
    return x


def bilstm_masked(x: jax.Array, params: list, n_valid: jax.Array):
    """:func:`bilstm` over only the first ``n_valid[b]`` frames of each
    zero-padded row, with static shapes (``n_valid`` may be traced).

    Outputs at valid positions are bit-equal to running ``bilstm`` on the
    unpadded row: the forward scan never sees padding before a valid
    frame, and the backward scan runs over the per-row roll-to-end + flip
    of the sequence, so it consumes exactly the reversed valid region
    first. Outputs at padded positions are garbage — mask downstream.
    """
    def roll_rows(a, shift):
        return jax.vmap(lambda row, s: jnp.roll(row, s, axis=0))(a, shift)

    T = x.shape[1]
    shift = (T - n_valid).astype(jnp.int32)  # [B]
    for p in params:
        fwd, _ = _layer(x, p["fwd"])
        xr = jnp.flip(roll_rows(x, shift), axis=1)
        bwd, _ = _layer(xr, p["bwd"])
        bwd = roll_rows(jnp.flip(bwd, axis=1), -shift)
        x = jnp.concatenate([fwd, bwd], axis=-1)
    return x


def init_bilstm_params(key, num_layers: int, input_size: int, hidden_size: int):
    params = []
    for li in range(num_layers):
        cin = input_size if li == 0 else 2 * hidden_size
        k1, k2, key = jax.random.split(key, 3)
        params.append(
            {
                "fwd": init_lstm_params(k1, 1, cin, hidden_size)[0],
                "bwd": init_lstm_params(k2, 1, cin, hidden_size)[0],
            }
        )
    return params


def init_lstm_params(key, num_layers: int, input_size: int, hidden_size: int):
    params = []
    for li in range(num_layers):
        cin = input_size if li == 0 else hidden_size
        k1, k2, key = jax.random.split(key, 3)
        s = 1.0 / jnp.sqrt(hidden_size)
        params.append(
            {
                "w_ih": jax.random.uniform(k1, (cin, 4 * hidden_size), minval=-s, maxval=s),
                "w_hh": jax.random.uniform(k2, (hidden_size, 4 * hidden_size), minval=-s, maxval=s),
                "b": jnp.zeros((4 * hidden_size,)),
            }
        )
    return params
