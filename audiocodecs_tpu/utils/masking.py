"""Length/mask utilities for static-shape TPU execution.

The reference carries Python-dynamic lengths everywhere (relative ``length``
vectors → boolean padding masks, e.g. reference ``encodec.py:84-89``). Under
XLA everything must be static-shaped, so the framework represents variable
lengths as (padded array, relative-length vector) pairs and provides bucketing
helpers so jit recompiles only once per bucket.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

__all__ = ["length_mask", "pad_to_bucket", "pad_to_multiple", "relative_to_absolute"]


def relative_to_absolute(length: jax.Array, total: int) -> jax.Array:
    """Relative lengths in [0, 1] → absolute sample counts (rounded)."""
    return jnp.round(length * total).astype(jnp.int32)


def length_mask(length: jax.Array, total: int, dtype=jnp.bool_) -> jax.Array:
    """``[B]`` relative lengths → ``[B, total]`` validity mask.

    Matches the reference's mask construction
    (``arange(max_len) < abs_lens[:, None]``, reference ``encodec.py:84-89``).
    """
    abs_lens = length * total
    idx = jnp.arange(total, dtype=jnp.float32)[None]
    return (idx < abs_lens[:, None]).astype(dtype)


def pad_to_multiple(x: jax.Array, multiple: int, axis: int = -1, value=0.0):
    """Pad ``x`` along ``axis`` up to the next multiple of ``multiple``.

    Returns ``(padded, orig_size)``; a host-side static-shape operation.
    """
    size = x.shape[axis]
    target = int(math.ceil(size / multiple) * multiple)
    if target == size:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value), size


def pad_to_bucket(x: jax.Array, buckets: tuple[int, ...], axis: int = -1, value=0.0):
    """Pad ``x`` along ``axis`` to the smallest bucket ≥ its size.

    Static-shape bucketing keeps the number of distinct XLA compilations
    bounded. Raises if no bucket is large enough.
    """
    size = x.shape[axis]
    for b in sorted(buckets):
        if b >= size:
            target = b
            break
    else:
        raise ValueError(f"no bucket >= {size} in {buckets}")
    if target == size:
        return x, size
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (0, target - size)
    return jnp.pad(x, pads, constant_values=value), size
