"""Fused DAC residual unit as a Pallas TPU kernel (decode-side).

The DAC/BigCodec decoder's tail stages (C=96..192 at T up to 441k) are
where its batch-1 latency lives: XLA lowers the k=7 dilated conv with
per-tap HBM traffic — measured 7.9 ms for ONE k7 C96 conv at T=441k on
v5e, ~10× over both the FLOP and bandwidth rooflines (BENCH_NOTES round
3 snake probe). This kernel computes the whole unit —

    out = x + conv1(snake(conv7_d(snake(x, α1)), α2))

— in one pass over the data: each grid step holds a time tile (+ a 3·d
halo on each side, pre-gathered — BlockSpec windows cannot overlap) in
VMEM, runs the dilated conv as 7 shifted ``[tile, C] @ [C, C]`` MXU
matmuls, the snakes on the VPU, and writes the finished tile. Traffic
drops to ~read-once/write-once.

Decode-side only by design: tokens never depend on the decoder, so the
kernel is free to use DEFAULT (1-pass bf16) dots — exactly the mode that
made a fused kernel unprofitable on the exactness-bound ENCODER in round
2 (`ops/seanet_block_packed.py` conclusions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["dac_resunit_pallas"]

_PRECISIONS = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGHEST,  # Mosaic lowers DEFAULT/HIGHEST only
    "highest": jax.lax.Precision.HIGHEST,
}


def _snake(x, alpha, poly: bool):
    if poly:
        # Decode-only polynomial sin² (same approximant as the XLA path's
        # models/dac.py:_snake_sin2_poly under ACX_SNAKE_APPROX=1), but
        # with an f32 floor-based range reduction: Mosaic cannot legalize
        # math.roundeven on bf16 vectors, and floor(u+1/2) differs from
        # roundeven only at half-integers, where the even polynomial in
        # r² is symmetric (r=±1/2 → same t) — bit-identical output.
        import math

        from audiocodecs_tpu.models.dac import _SNAKE_COS_POLY

        y = (alpha * x).astype(jnp.float32)
        u = y * (1.0 / math.pi)
        r = u - jnp.floor(u + 0.5)
        t = r * r
        cos2 = jnp.float32(_SNAKE_COS_POLY[-1])
        for c in _SNAKE_COS_POLY[-2::-1]:
            cos2 = cos2 * t + jnp.float32(c)
        s2 = 0.5 - 0.5 * cos2
        return (x.astype(jnp.float32)
                + s2 / (alpha.astype(jnp.float32) + 1e-9)).astype(x.dtype)
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


def _kernel(x_ref, lh_ref, rh_ref, w7_ref, b7_ref, a1_ref, w1_ref, b1_ref,
            a2_ref, out_ref, *, tile: int, dilation: int, precision,
            snake_poly: bool):
    pad = 3 * dilation
    x = jnp.concatenate([lh_ref[0, 0], x_ref[0], rh_ref[0, 0]],
                        axis=0)  # [tile + 6d, C]
    h = _snake(x, a1_ref[:], snake_poly)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                            precision=precision)
    acc = dot(h[0:tile], w7_ref[0])
    for k in range(1, 7):
        acc += dot(h[k * dilation : k * dilation + tile], w7_ref[k])
    h2 = _snake(acc + b7_ref[:], a2_ref[:], snake_poly)
    y = dot(h2, w1_ref[0]) + b1_ref[:]
    out_ref[0] = x[pad : pad + tile] + y


@functools.partial(
    jax.jit,
    static_argnames=("dilation", "tile", "interpret", "precision_name",
                     "snake_poly"))
def dac_resunit_pallas(x: jax.Array, w7, b7, alpha1, w1, b1, alpha2, *,
                       dilation: int = 1, tile: int | None = None,
                       interpret: bool = False,
                       precision_name: str = "default",
                       snake_poly: bool = False) -> jax.Array:
    """``x``: [B, T, C] (unpadded); ``w7``: [7, C, C]; ``w1``: [1, C, C];
    ``alpha*``: [C]. Returns [B, T, C] — identical math to
    ``models.dac._residual_unit`` (symmetric 3·d zero padding, so
    out_len == in_len and the residual trim is zero)."""
    B, T, C = x.shape
    pad = 3 * dilation
    if tile is None:
        # ~8 tile-sized f32 temporaries live at once (x/h/acc/h2/y + the
        # double-buffered in/out blocks); keep them under the ~16 MB
        # scoped VMEM: tile·C_eff·4·8 ≤ 8 MB  (C=192 OOM'd at 2728).
        tile = max(512, min(4096, (1 << 18) // max(C, 128)))
    tile &= ~7  # Mosaic: sublane (2nd-to-last) block dim must be 8-divisible
    n_tiles = pl.cdiv(T, tile)
    T_pad = n_tiles * tile
    xp = jnp.pad(x, ((0, 0), (pad, pad + T_pad - T), (0, 0)))
    body = xp[:, pad : pad + T_pad]
    starts = jnp.arange(n_tiles) * tile
    lh_idx = starts[:, None] + jnp.arange(pad)[None, :]
    rh_idx = starts[:, None] + (pad + tile) + jnp.arange(pad)[None, :]
    lh = jnp.take(xp, lh_idx, axis=1)  # [B, n_tiles, pad, C]
    rh = jnp.take(xp, jnp.minimum(rh_idx, xp.shape[1] - 1), axis=1)

    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, dilation=dilation,
                          precision=_PRECISIONS[precision_name],
                          snake_poly=snake_poly),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, C), jnp.float32),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pad, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, pad, C), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, C), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((C,), lambda b, i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(body, lh, rh, w7, b7, alpha1, w1, b1, alpha2)
    return out[:, :T]
