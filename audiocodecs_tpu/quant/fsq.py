"""Finite Scalar Quantization (FSQ).

Used by the StableCodec / NanoCodec / XCodec2 model families in the reference
zoo (reference ``stablecodec.py:32-38`` — residual FSQ grids like (2, 15625);
``nanocodec.py:40`` — 4 FSQ codebooks; ``xcodec2.py:66-71``).

FSQ quantizes each latent dimension independently onto a small integer grid
(``levels[i]`` points), so the "codebook" is implicit and the code index is a
mixed-radix number over per-dimension digits — all elementwise VPU work, no
nearest-neighbor search at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "fsq_bound",
    "fsq_quantize",
    "fsq_codes_to_indices",
    "fsq_indices_to_codes",
    "fsq_implicit_codebook",
]


def fsq_bound(z: jax.Array, levels: tuple[int, ...], eps: float = 1e-3) -> jax.Array:
    """Bound ``z`` (``[..., D]``) into the FSQ lattice range via tanh."""
    lv = jnp.asarray(levels, dtype=z.dtype)
    half_l = (lv - 1) * (1 + eps) / 2
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    return jnp.tanh(z + shift) * half_l - offset


def fsq_quantize(z: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    """Round bounded latents to grid points, normalized to ``[-1, 1]``."""
    q = jnp.round(fsq_bound(z, levels))
    half_width = jnp.asarray(levels, dtype=z.dtype) // 2
    return q / half_width


def fsq_codes_to_indices(codes: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    """Normalized grid codes ``[..., D]`` → flat mixed-radix index ``[...]``."""
    lv = jnp.asarray(levels, dtype=codes.dtype)
    half_width = lv // 2
    digits = codes * half_width + half_width  # 0 .. L-1 per dim
    basis = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int32)
    return jnp.sum(digits * jnp.asarray(basis, dtype=codes.dtype), axis=-1).astype(
        jnp.int32
    )


def fsq_indices_to_codes(indices: jax.Array, levels: tuple[int, ...]) -> jax.Array:
    """Flat index ``[...]`` → normalized grid codes ``[..., D]``."""
    basis = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int32)
    lv = np.asarray(levels, dtype=np.int32)
    digits = (indices[..., None] // jnp.asarray(basis)) % jnp.asarray(lv)
    half_width = jnp.asarray(lv // 2, dtype=jnp.float32)
    return (digits.astype(jnp.float32) - half_width) / half_width


def fsq_implicit_codebook(levels: tuple[int, ...]) -> np.ndarray:
    """Materialize the full ``[prod(levels), D]`` implicit codebook.

    Feeds the uniform ``embs()`` API (``[K, C, H]``) that powers token
    corruption and embedding pretraining in the downstream suite.
    """
    total = int(np.prod(levels))
    idx = np.arange(total, dtype=np.int64)
    basis = np.concatenate([[1], np.cumprod(levels[:-1])]).astype(np.int64)
    lv = np.asarray(levels, dtype=np.int64)
    digits = (idx[:, None] // basis) % lv
    half_width = (lv // 2).astype(np.float64)
    return ((digits - half_width) / half_width).astype(np.float32)
