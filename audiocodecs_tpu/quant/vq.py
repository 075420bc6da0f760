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
    return jnp.argmax(score, axis=-1).astype(jnp.int32)


def vq_decode(indices: jax.Array, codebook: jax.Array) -> jax.Array:
    """Indices [...] → codewords [..., H] (embedding lookup / gather)."""
    return jnp.take(codebook, indices, axis=0)
