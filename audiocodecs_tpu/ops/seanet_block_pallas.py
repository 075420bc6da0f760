"""Fused SEANet residual block as a Pallas TPU kernel.

The early EnCodec-family residual blocks dominate codec latency: at
``C=32..64`` and ``T≈240k`` the XLA path makes ~8 HBM round trips per block
(reflect-pad copies, two convs, shortcut, residual add, ELUs). This kernel
computes the whole block —

    out = shortcut(x) + conv1(ELU(conv3(ELU(x))))

— in ONE pass over the data: each grid step holds a time tile in VMEM, runs
the k=3 conv as 3 shifted ``[T, C] @ [C, C/2]`` MXU matmuls, the 1×1 convs
as plain matmuls, and the ELUs/residual on the VPU, then writes the finished
tile. Traffic drops to ~read-once/write-once.

Tiling: BlockSpec windows cannot overlap, so the 2-sample causal halo each
tile needs is passed as a second (tiny) pre-gathered input
``[B, n_tiles, 2, C]``; the caller pre-pads the sequence start (reflect, per
the codec's pad mode) before calling.

Scope: dilation-1 blocks with conv shortcut — exactly the EnCodec-family
residual blocks (``num_residual_layers=1`` ⇒ dilations (1, 1)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["seanet_resblock_pallas"]

# Mosaic lowers DEFAULT and HIGHEST dots only; the kernel is HBM-bound, so
# "high" maps to exact HIGHEST at no practical cost.
_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,
    "highest": jax.lax.Precision.HIGHEST,
}


def _elu(x):
    # exp(x) - 1 rather than expm1 (not lowerable in Mosaic); for x ≤ 0 the
    # cancellation error is ≤1 ulp of the result at small |x|.
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _kernel(x_ref, halo_ref, w1_ref, b1_ref, w2_ref, b2_ref, ws_ref, bs_ref,
            out_ref, *, tile: int, precision):
    x = jnp.concatenate([halo_ref[0, 0], x_ref[0]], axis=0)  # [tile+2, C]
    h = _elu(x)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=precision)
    acc = dot(h[0:tile], w1_ref[0])
    acc += dot(h[1 : tile + 1], w1_ref[1])
    acc += dot(h[2 : tile + 2], w1_ref[2])
    h2 = _elu(acc + b1_ref[:])
    y = dot(h2, w2_ref[:]) + b2_ref[:]
    short = dot(x[2 : tile + 2], ws_ref[:]) + bs_ref[:]
    out_ref[0] = short + y


@functools.partial(jax.jit,
                   static_argnames=("tile", "interpret", "precision_name"))
def seanet_resblock_pallas(x_padded: jax.Array, w1, b1, w2, b2, ws, bs,
                           *, tile: int | None = None,
                           interpret: bool = False,
                           precision_name: str = "highest"):
    """Run the fused residual block.

    ``x_padded``: [B, T + 2, C] — the caller pre-pads the 2 causal samples
    (reflect/zero per the codec's pad mode). ``w1``: [3, C, H] conv taps;
    ``w2``: [H, C]; ``ws``: [C, C]. Returns [B, T, C] float32.
    """
    B, Tp, C = x_padded.shape
    T = Tp - 2
    H = w1.shape[-1]
    if tile is None:
        # Mosaic pads the lane dim to 128, so budget with max(C, 128):
        # keep tile·C_eff ≈ 256k elements (~1 MB f32) so the double-buffered
        # in/out blocks + kernel temporaries stay within the 16 MB VMEM.
        tile = max(256, min(2048, (1 << 18) // max(C, 128)))
    precision = _PRECISIONS[precision_name]
    n_tiles = pl.cdiv(T, tile)
    T_pad = n_tiles * tile
    if T_pad != T:
        x_padded = jnp.pad(x_padded, ((0, 0), (0, T_pad - T), (0, 0)))

    body = x_padded[:, 2:]  # [B, T_pad, C] — disjoint tiles
    starts = jnp.arange(n_tiles) * tile
    halo_idx = starts[:, None] + jnp.arange(2)[None, :]  # [n_tiles, 2]
    halos = jnp.take(x_padded, halo_idx, axis=1)  # [B, n_tiles, 2, C]

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, precision=precision),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, C, H), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((H, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(body, halos, w1, b1, w2, b2, ws, bs)
    return out[:, :T]
