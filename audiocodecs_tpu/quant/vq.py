"""Euclidean vector quantization as MXU matmuls.

Nearest-codeword search is phrased as
``argmax(2·x·Eᵀ − ‖e‖²)`` — one ``[B·N, H] @ [H, C]`` matmul against the
codebook plus a bias, which XLA tiles straight onto the MXU. The ``‖x‖²``
term is constant across codewords, so it is dropped from the argmax (the
PyTorch reference keeps it; dropping it cannot change the winner but avoids
a full vector-norm pass over activations).

Matches the semantics of the reference codecs' EuclideanCodebook quantizers
(e.g. EnCodec RVQ layers, reference ``encodec.py:76-79`` exposes them as
``embs()``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["vq_encode", "vq_decode"]


def _tiled_argmax_min_c() -> int:
    """Two-stage argmax floor (``ACX_VQ_TILED_ARGMAX``, codebook rows).

    ``jnp.argmax`` lowers to a variadic (value, index) reduce; over a huge
    minor axis (MagiCodec's 131072-row codebook, ``models/magicodec.py``)
    that reduce is the suspected cost of the zoo outlier. The two-stage
    form (argmax within 128-lane tiles, then argmax over per-tile maxima)
    keeps both reduces small and preserves the exact lowest-index
    tie-break. ``0`` disables; default engages at C ≥ 16384.
    """
    import os

    v = os.environ.get("ACX_VQ_TILED_ARGMAX", "auto").lower()
    if v == "0":
        return 1 << 62
    if v in ("1", "auto"):
        return 16384
    return int(v)


def _argmax_lowest(score: jax.Array) -> jax.Array:
    """argmax over the last axis, lowest index on ties; two-stage over
    128-wide tiles when the axis is huge (and a multiple of 128)."""
    C = score.shape[-1]
    G = 128
    if C < _tiled_argmax_min_c() or C % G:
        return jnp.argmax(score, axis=-1).astype(jnp.int32)
    tiles = score.reshape(*score.shape[:-1], C // G, G)
    tmax = jnp.max(tiles, axis=-1)
    targ = jnp.argmax(tiles, axis=-1)  # lowest-in-tile on ties
    outer = jnp.argmax(tmax, axis=-1)  # lowest tile on ties
    inner = jnp.take_along_axis(targ, outer[..., None], axis=-1)[..., 0]
    return (outer * G + inner).astype(jnp.int32)


def vq_encode(x: jax.Array, codebook: jax.Array, *, exact: bool = True) -> jax.Array:
    """Nearest codeword indices.

    ``x``: [..., H]; ``codebook``: [C, H] → int32 [...].

    With ``exact=True`` (the parity path), distances are computed in float32
    with HIGHEST precision so argmax decisions match the PyTorch reference
    bit-for-bit; ties break toward the lower index (same as torch
    ``.max(dim=-1)``).
    """
    precision = lax.Precision.HIGHEST if exact else lax.Precision.DEFAULT
    score = 2.0 * jnp.einsum(
        "...h,ch->...c", x, codebook, precision=precision
    ) - jnp.sum(codebook * codebook, axis=-1)
    return _argmax_lowest(score)


def vq_decode(indices: jax.Array, codebook: jax.Array) -> jax.Array:
    """Indices [...] → codewords [..., H] (embedding lookup / gather)."""
    return jnp.take(codebook, indices, axis=0)
