"""Core 1-D NN primitives, channel-last (``[B, T, C]``), TPU-first.

Channel-last keeps the channel axis on the TPU lane dimension (128-wide), so
XLA lowers the conv stacks onto the MXU without layout transposes. Weight
layout is ``[K, Cin, Cout]`` (``'HIO'``); converters from PyTorch checkpoints
transpose once at load time and fold weight-norm into plain weights.

Padding semantics reproduce the reference codecs' conv arithmetic
(causal/asymmetric padding + right "extra" padding to a whole number of
frames — see reference-cited HF EnCodec conv behavior) but are computed
statically at trace time: under XLA all shapes are compile-time constants, so
what the reference computes with tensor ops per call becomes Python ints.
"""

from __future__ import annotations

import math
from contextlib import contextmanager as _contextmanager


import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "pad1d",
    "causal_conv1d",
    "streaming_conv_frames",
    "elu",
    "unit_norm",
    "conv_precision",
    "conv_role",
    "act_dtype",
]


def act_dtype(role: str = "encoder"):
    """Conv-stack activation dtype, settable via ``ACX_ACT_DTYPE``.

    ``float32`` (default) — the token-parity path. ``bfloat16`` runs the
    SEANet/DAC conv stacks in bf16 (half the HBM traffic, native 1-pass MXU
    matmuls) with f32 islands at the quantizer boundary and inside LSTMs.
    ``decoder-bfloat16`` applies bf16 only where ``role == "decoder"`` —
    the decode side has no argmin boundary, so tokens stay bit-identical
    while decode rides the fast path (bench.py's default). Full-bf16 encode
    can flip argmin-marginal tokens; bench.py reports the match rate.
    """
    import os

    v = os.environ.get("ACX_ACT_DTYPE", "float32").lower()
    if v in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if v in ("decoder-bf16", "decoder-bfloat16") and role == "decoder":
        return jnp.bfloat16
    return jnp.float32


_CONV_ROLE = "encoder"


@_contextmanager
def conv_role(role: str):
    """Trace-time scope marking convs as encode- or decode-side.

    Decode-side convs never influence tokens (the argmin boundary is on the
    encoder), so they may run at a lower accumulation precision without
    weakening the token-exactness guarantee. ``ACX_DEC_CONV_PRECISION``
    overrides ``ACX_CONV_PRECISION`` inside a ``conv_role("decoder")``
    scope. Measured on v5e (BENCH_NOTES round 3): DAC-44.1k decode is
    *faster* under HIGH (3-pass, f32 activations: 125 ms) than under bf16
    activations (178 ms) — the win that pushed batch-1 DAC past the 50×
    north star with a bit-exact encoder.
    """
    global _CONV_ROLE
    prev = _CONV_ROLE
    _CONV_ROLE = role
    try:
        yield
    finally:
        _CONV_ROLE = prev


def conv_precision():
    """Conv accumulation precision, settable via ``ACX_CONV_PRECISION``.

    ``highest`` (default) = 6-pass bf16 ≈ exact f32 — the token-parity path.
    ``high`` = 3-pass bf16 — ~2× faster convs; validated to produce identical
    tokens on test signals but not bit-guaranteed.

    Inside a ``conv_role("decoder")`` scope, ``ACX_DEC_CONV_PRECISION``
    (same values) takes precedence when set — decode precision cannot
    affect tokens, so it is free to ride a faster path.

    (conv1d/conv_transpose1d drop to DEFAULT on bf16 operands regardless —
    multi-pass upcasting would defeat the point of bf16 activations.)
    """
    import os

    v = os.environ.get("ACX_CONV_PRECISION", "highest").lower()
    if _CONV_ROLE == "decoder":
        v = os.environ.get("ACX_DEC_CONV_PRECISION", "").lower() or v
    return {
        "default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
    }[v]


def elu(x, alpha: float = 1.0):
    return jnp.where(x > 0, x, alpha * jnp.expm1(x))


def _conv_layout():
    """Narrow-conv layout, settable via ``ACX_CONV_LAYOUT``.

    ``auto`` (default): native convs everywhere — measured fastest
    end-to-end. With ``ACX_UNFOLD_MAX_CIN=N`` > 0, convs whose input
    channel count is ≤ N lower as an unfold-einsum with TIME on the lane
    axis (:func:`_conv1d_unfold`) — 1.5–4.5× faster in ISOLATION at narrow
    widths (native pads output channels to 128 lanes), but measured SLOWER
    inside the full codec graphs (the layout transposes break XLA's
    conv+elementwise fusion): config #1 bench 1653× native vs 1411× stem
    -only vs 1129× Cin≤32 (see BENCH_NOTES). Kept as an opt-in experiment.
    ``native`` / ``unfold`` force one path.
    """
    import os

    return os.environ.get("ACX_CONV_LAYOUT", "auto").lower()


def _unfold_max_cin() -> int:
    import os

    return int(os.environ.get("ACX_UNFOLD_MAX_CIN", "0"))


def _conv1d_unfold(x, w, b, stride, dilation, precision):
    """Conv as shifted-unfold einsum: ``y[b,c2,t] = W[c2,k·c]·x[b,c,s·t+k·d]``.

    Puts the (huge) time axis on the 128-lane dim, so narrow-channel stages
    stop wasting lanes. Identical math to the native conv; accumulation
    order differs (≤1e-6 relative — bench.py verifies token match).
    """
    K, Cin, Cout = w.shape
    B, T, _ = x.shape
    To = (T - (K - 1) * dilation - 1) // stride + 1
    xt = jnp.transpose(x, (0, 2, 1))  # [B, C, T]
    taps = [
        lax.slice(xt, (0, 0, k * dilation),
                  (B, Cin, k * dilation + (To - 1) * stride + 1),
                  (1, 1, stride))
        for k in range(K)
    ]
    x_unf = jnp.concatenate(taps, axis=1)  # [B, K·C, To]
    wf = w.reshape(K * Cin, Cout)
    y = jnp.einsum("dc,bdt->bct", wf, x_unf, precision=precision)
    y = jnp.transpose(y, (0, 2, 1))
    return y if b is None else y + b


def _pack_stem_enabled() -> bool:
    """Batch-packed waveform stems, settable via ``ACX_PACK_STEM=1``.

    The C_in=1 stem conv wastes the MXU contraction dim entirely; packing
    batch into the channel axis ([B,T,1] → [1,T,B]) and tiling the kernel
    into B groups runs 3.65× faster in ISOLATION on v5e (B=8, C1→8,
    T=240k: 12.8 → 3.5 ms) with bit-identical math (same K-tap contraction
    per output). End-to-end, however, config #1 measured 169.8× vs 193.3×
    per stream: the unpack transpose breaks XLA's stem→ELU→conv fusion,
    costing more than the lane win — the same failure mode as the
    unfold-einsum layout (BENCH_NOTES round 3). Default OFF; kept as a
    tested opt-in experiment.
    """
    import os

    return os.environ.get("ACX_PACK_STEM", "0") == "1"


def _framed_conv_mode() -> str:
    """Huge-stride convs as frame-reshape + ONE matmul (``ACX_FRAMED_CONV``).

    Patchify stems like MagiCodec's (k=640, s=320, Cin=1 —
    ``models/magicodec.py``) are pathological for XLA's conv lowering (a
    640-tap window is far past any tiling sweet spot) but are exactly a
    reshape + [K·Cin → Cout] matmul when ``K % stride == 0``. ``auto``
    (default) engages the framed form at ``stride ≥ 32``; ``0``/``1``
    force it off/on (``1`` lowers the stride floor to 2). Same contraction
    (accumulation order may differ at the float ulp level — parity oracles
    cover the token-affecting encoder stems).
    """
    import os

    return os.environ.get("ACX_FRAMED_CONV", "auto").lower()


def _framed_engaged(stride: int, K: int, dilation: int, groups: int) -> bool:
    mode = _framed_conv_mode()
    if mode == "0" or dilation != 1 or groups != 1 or K % stride:
        return False
    return stride >= (2 if mode == "1" else 32)


def _conv1d_framed(x, w, b, stride, precision):
    """``K = m·s`` strided conv as frames (two reshapes + concat) + one
    ``[B, To, K·Cin] × [K·Cin, Cout]`` matmul on the MXU."""
    K, Cin, Cout = w.shape
    B, T, _ = x.shape
    m = K // stride
    To = (T - K) // stride + 1
    n_chunks = T // stride
    xc = x[:, : n_chunks * stride].reshape(B, n_chunks, stride, Cin)
    # frame n = samples [n·s, n·s + K): chunk-tap i contributes positions
    # k = i·s + u, so concatenating tap-shifted chunk views on the
    # within-frame axis reproduces the conv window ordering exactly.
    frames = jnp.concatenate([xc[:, i : i + To] for i in range(m)], axis=2)
    y = jnp.einsum("btd,dc->btc", frames.reshape(B, To, K * Cin),
                   w.reshape(K * Cin, Cout), precision=precision)
    return y if b is None else y + b


def _conv_transpose1d_framed(x, w, b, stride, precision):
    """``K = m·s`` transposed conv as one ``[Cin → K·Cout]`` matmul + an
    m-way shifted overlap-add (the scatter form: ``y[n·s+o] += x[n]·
    w[K−1−o]`` — same trim semantics as the lhs-dilated lowering)."""
    K, Cin, Cout = w.shape
    B, T, _ = x.shape
    m = K // stride
    wf = jnp.transpose(jnp.flip(w, axis=0), (1, 0, 2)).reshape(
        Cin, K * Cout)
    seg = jnp.einsum("btc,cd->btd", x, wf, precision=precision)
    seg = seg.reshape(B, T, m, stride, Cout)
    out = jnp.zeros((B, T + m - 1, stride, Cout), seg.dtype)
    for i in range(m):
        out = out.at[:, i : i + T].add(seg[:, :, i])
    y = out.reshape(B, (T + m - 1) * stride, Cout)
    return y if b is None else y + b


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """Valid-padding conv. ``x``: [B, T, Cin], ``w``: [K, Cin/groups, Cout]."""
    if precision is None:
        precision = (lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
                     else conv_precision())
    if _framed_engaged(stride, w.shape[0], dilation, groups):
        return _conv1d_framed(x, w, b, stride, precision)
    if (groups == 1 and x.shape[-1] == 1 and x.shape[0] > 1
            and w.shape[0] > 1 and _pack_stem_enabled()):
        B, T, _ = x.shape
        K, _, Cout = w.shape
        xp = jnp.transpose(x, (1, 0, 2)).reshape(1, T, B)
        y = lax.conv_general_dilated(
            xp, jnp.tile(w, (1, 1, B)), (stride,), "VALID",
            rhs_dilation=(dilation,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=B, precision=precision,
        )
        y = jnp.transpose(y[0].reshape(y.shape[1], B, Cout), (1, 0, 2))
        return y if b is None else y + b
    layout = _conv_layout()
    if groups == 1 and (
        layout == "unfold"
        or (layout == "auto" and w.shape[1] <= _unfold_max_cin()
            and x.dtype == jnp.float32
            and jax.default_backend() == "tpu")
    ):
        return _conv1d_unfold(x, w, b, stride, dilation, precision)
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """Full transposed conv (output length ``(T-1)*stride + K``).

    ``x``: [B, T, Cin]; ``w``: [K, Cin/groups, Cout] stored *pre-flipped*
    relative to the forward conv (converters flip the PyTorch
    ``ConvTranspose1d`` kernel on load so this is a plain dilated conv —
    cheapest form for XLA).
    """
    if precision is None:
        precision = (lax.Precision.DEFAULT if x.dtype == jnp.bfloat16
                     else conv_precision())
    if _framed_engaged(stride, w.shape[0], 1, groups):
        return _conv_transpose1d_framed(x, w, b, stride, precision)
    k = w.shape[0]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def pad1d(x: jax.Array, left: int, right: int, mode: str = "constant") -> jax.Array:
    """Pad the time axis of ``[B, T, C]``.

    Reflect mode replicates the reference's small-input workaround: if the
    signal is shorter than the pad, zero-extend right before reflecting then
    trim (reference-cited HF ``EncodecConv1d._pad1d`` behavior).
    """
    if left == 0 and right == 0:
        return x
    if mode in ("constant", "zero"):
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)))
    if mode == "reflect":
        length = x.shape[1]
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
        y = jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="reflect")
        if extra:
            y = y[:, : y.shape[1] - extra]
        return y
    if mode == "replicate":
        return jnp.pad(x, ((0, 0), (left, right), (0, 0)), mode="edge")
    raise ValueError(f"unknown pad mode: {mode}")


def extra_padding_for_frames(
    length: int, kernel_size: int, stride: int, padding_total: int
) -> int:
    """Right padding so the conv covers a whole number of frames (static)."""
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + kernel_size - padding_total
    return max(0, ideal - length)


def causal_conv1d(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array | None = None,
    *,
    stride: int = 1,
    dilation: int = 1,
    causal: bool = True,
    pad_mode: str = "reflect",
) -> jax.Array:
    """Conv with the reference codecs' framing: causal-left (or asymmetric)
    padding plus right extra-padding to a whole frame count."""
    k = w.shape[0]
    eff_k = (k - 1) * dilation + 1
    padding_total = eff_k - stride
    extra = extra_padding_for_frames(x.shape[1], eff_k, stride, padding_total)
    if causal:
        x = pad1d(x, padding_total, extra, mode=pad_mode)
    else:
        right = padding_total // 2
        left = padding_total - right
        x = pad1d(x, left, right + extra, mode=pad_mode)
    return conv1d(x, w, b, stride=stride, dilation=dilation)


def streaming_conv_frames(length: int, kernel_size: int, stride: int) -> int:
    """Number of output frames for a causal conv over ``length`` samples."""
    padding_total = kernel_size - stride
    extra = extra_padding_for_frames(length, kernel_size, stride, padding_total)
    return (length + padding_total + extra - kernel_size) // stride + 1


def unit_norm(x: jax.Array, axis: int = -1, eps: float = 1e-12) -> jax.Array:
    return x * lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def fold_weight_norm(weight_v, weight_g, axis_reduce):
    """Fold weight-norm (v, g) into a plain weight: w = g * v / ||v||."""
    norm = jnp.sqrt(jnp.sum(weight_v**2, axis=axis_reduce, keepdims=True))
    return weight_g * weight_v / norm
