"""Packed-lane fused SEANet residual block (Pallas TPU kernel, v2).

The v1 fused block and XLA's conv are both compute-bound at EnCodec's early
widths because C=32..64 channels occupy a quarter/half of the 128-wide lane
dimension. This kernel packs ``P = 128 // C`` consecutive time samples into
the lanes (sample-major: lane = s·C + c), so every matmul runs at full lane
utilization:

  * the k=3 conv's taps become rolls of the packed rows
    (``pltpu.roll`` within a row + a previous-row fix for the wrapped
    lanes) against block-diagonal weights ``kron(I_P, W)``;
  * the 1×1 convs and the shortcut are plain ``[rows, P·C] @ [P·C, P·H]``
    matmuls.

Same math as ``_apply_resnet`` (dilation-1, conv shortcut); the caller
pre-pads 2 causal samples and P-aligns the length.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["seanet_resblock_packed"]


def _elu(x):
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _shift_rows_down(x, halo_row):
    """rows[r] ← rows[r-1], rows[0] ← halo_row. ``x``: [R, L]."""
    return jnp.concatenate([halo_row, x[:-1]], axis=0)


def _tap_shift(x, prev_rows, j, C, lanes):
    """Packed h[t-j]: roll lanes right by j·C; wrapped lanes come from the
    previous row."""
    if j == 0:
        return x
    rolled = pltpu.roll(x, j * C, 1)
    rolled_prev = pltpu.roll(prev_rows, j * C, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < j * C, rolled_prev, rolled)


def _kernel(x_ref, halo_ref, w1p_ref, b1_ref, w2p_ref, b2_ref, wsp_ref,
            bs_ref, out_ref, *, C: int, precision):
    x = x_ref[0]  # [rows, P*C]
    lanes = x.shape[-1]
    halo = halo_ref[0, 0]  # [1, P*C] — previous packed row
    h = _elu(x)
    h_prev = _elu(_shift_rows_down(x, halo))
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=precision)
    # y = h[t-2]·W1[0] + h[t-1]·W1[1] + h[t]·W1[2]
    acc = dot(_tap_shift(h, h_prev, 2, C, lanes), w1p_ref[0])
    acc += dot(_tap_shift(h, h_prev, 1, C, lanes), w1p_ref[1])
    acc += dot(h, w1p_ref[2])
    h2 = _elu(acc + b1_ref[:])
    y = dot(h2, w2p_ref[:]) + b2_ref[:]
    short = dot(x, wsp_ref[:]) + bs_ref[:]
    out_ref[0] = short + y


@functools.partial(jax.jit,
                   static_argnames=("tile_rows", "interpret",
                                    "precision_name"))
def seanet_resblock_packed(x: jax.Array, w1, b1, w2, b2, ws, bs,
                           *, tile_rows: int = 512, interpret: bool = False,
                           precision_name: str = "highest"):
    """Fused residual block with lane packing.

    ``x``: [B, T, C] (unpadded input; causal left-pad handled internally
    with zeros — use on constant-pad configs or interior chunks);
    ``w1``: [3, C, H]; ``w2``: [H, C]; ``ws``: [C, C]. Returns [B, T, C].
    """
    B, T, C = x.shape
    H = w1.shape[-1]
    P = 128 // C
    if P < 2:
        # the j=2 tap's lane roll is 2·C ≡ 0 (mod 128) at P == 1, which
        # would silently read h[t−1] instead of h[t−2]
        raise ValueError(
            f"seanet_resblock_packed needs C <= 64 (P >= 2); got C={C}")
    precision = {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGHEST,
        "highest": jax.lax.Precision.HIGHEST,
    }[precision_name]

    rows_total = -(-T // P)
    T_pad = rows_total * P
    if T_pad != T:
        x = jnp.pad(x, ((0, 0), (0, T_pad - T), (0, 0)))
    n_tiles = -(-rows_total // tile_rows)
    R_pad = n_tiles * tile_rows
    if R_pad != rows_total:
        x = jnp.pad(x, ((0, 0), (0, (R_pad - rows_total) * P), (0, 0)))
    X = x.reshape(B, R_pad, P * C)

    # halo rows: previous packed row per tile (zeros for the first tile)
    starts = jnp.arange(n_tiles) * tile_rows
    prev_idx = jnp.maximum(starts - 1, 0)
    halos = jnp.take(X, prev_idx, axis=1)[:, :, None, :]  # [B, n_tiles, 1, L]
    first = (starts == 0)[None, :, None, None]
    halos = jnp.where(first, 0.0, halos)

    eye = jnp.eye(P, dtype=jnp.float32)
    w1p = jnp.stack([jnp.kron(eye, w1[j]) for j in range(3)])  # [3, P·C, P·H]
    w2p = jnp.kron(eye, w2)  # [P·H, P·C]
    wsp = jnp.kron(eye, ws)  # [P·C, P·C]
    b1p = jnp.tile(b1, P)
    b2p = jnp.tile(b2, P)
    bsp = jnp.tile(bs, P)

    L, Lh = P * C, P * H
    out = pl.pallas_call(
        functools.partial(_kernel, C=C, precision=precision),
        out_shape=jax.ShapeDtypeStruct((B, R_pad, L), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_rows, L), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, L), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, L, Lh), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lh,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((Lh, L), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, L), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_rows, L), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(X, halos, w1p, b1p, w2p, b2p, wsp, bsp)
    return out.reshape(B, R_pad * P, C)[:, :T]
