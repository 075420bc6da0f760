"""Polyphase windowed-sinc resampling, TPU-native.

Numerically compatible with ``torchaudio.functional.resample`` (the reference
resamples on every codec path: reference ``audiocodecs/codec.py:57-119``), so
token streams produced after resampling match the PyTorch reference.

Design notes (TPU-first):
  * The polyphase kernel bank is computed host-side in float64 (it depends
    only on the rate pair, so it is a trace-time constant) and baked into the
    jitted graph as an ``[L, 1, P]`` filter.
  * The strided filtering is expressed as a single ``lax.conv_general_dilated``
    with ``stride = orig`` and ``P = new`` output channels — one dense op that
    XLA tiles onto the MXU, instead of a Python loop over phases.
  * Shapes are static: output length is ``ceil(T * new / orig)`` computed at
    trace time.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["resample", "resample_kernel", "resampled_length"]


def resampled_length(length: int, orig_freq: int, new_freq: int) -> int:
    """Output length of :func:`resample` for an input of ``length`` samples."""
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // gcd, int(new_freq) // gcd
    return int(math.ceil(new * length / orig))


@lru_cache(maxsize=None)
def resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    resampling_method: str = "sinc_interp_hann",
    beta: float | None = None,
):
    """Build the polyphase windowed-sinc kernel bank.

    Returns ``(kernel, width, orig, new)`` where ``kernel`` is a float64
    numpy array of shape ``[new, kernel_length]`` — one FIR filter per output
    phase — and ``width`` is the left/right context in input samples.

    The construction mirrors torchaudio's ``_get_sinc_resample_kernel``
    exactly (float64 math, identical clamping and windowing) so that
    resampled signals agree with the reference to float32 round-off.
    """
    if orig_freq <= 0 or new_freq <= 0:
        raise ValueError("frequencies must be positive")
    gcd = math.gcd(int(orig_freq), int(new_freq))
    orig, new = int(orig_freq) // gcd, int(new_freq) // gcd

    if lowpass_filter_width <= 0:
        raise ValueError("lowpass_filter_width must be positive")
    base_freq = min(orig, new) * rolloff
    width = int(math.ceil(lowpass_filter_width * orig / base_freq))

    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig  # [1, L]
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx  # [new, L]
    t *= base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    if resampling_method == "sinc_interp_hann":
        window = np.cos(t * math.pi / lowpass_filter_width / 2) ** 2
    elif resampling_method == "sinc_interp_kaiser":
        if beta is None:
            beta = 14.769656459379492
        window = np.i0(beta * np.sqrt(1 - (t / lowpass_filter_width) ** 2)) / np.i0(
            beta
        )
    else:
        raise ValueError(f"unknown resampling_method: {resampling_method}")

    t *= math.pi
    scale = base_freq / orig
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel *= window * scale
    return kernel, width, orig, new


def resample(
    waveform: jax.Array,
    orig_freq: int,
    new_freq: int,
    *,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    resampling_method: str = "sinc_interp_hann",
    beta: float | None = None,
) -> jax.Array:
    """Resample ``waveform`` (``[..., T]``) from ``orig_freq`` to ``new_freq``.

    Matches ``torchaudio.functional.resample`` numerics (reference hot path,
    ``audiocodecs/codec.py:59-63``). Pure and jittable; the kernel bank is a
    trace-time constant.
    """
    if orig_freq == new_freq:
        return waveform
    kernel_np, width, orig, new = resample_kernel(
        orig_freq,
        new_freq,
        lowpass_filter_width=lowpass_filter_width,
        rolloff=rolloff,
        resampling_method=resampling_method,
        beta=beta,
    )
    dtype = waveform.dtype
    # [L, 1, new]: spatial × in-channel × out-phase, for 'NHC'/'HIO' layout.
    kernel = jnp.asarray(kernel_np.T[:, None, :], dtype=dtype)

    shape = waveform.shape
    length = shape[-1]
    x = waveform.reshape(-1, length)  # [B*, T]
    x = jnp.pad(x, ((0, 0), (width, width + orig)))
    x = x[:, :, None]  # [B*, T', 1]
    # One strided conv: out[b, f, p] = phase-p filter at frame f.
    y = lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(orig,),
        padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"),
        precision=lax.Precision.HIGHEST,
    )
    y = y.reshape(y.shape[0], -1)  # interleave phases: [B*, frames*new]
    target_length = int(math.ceil(new * length / orig))
    y = y[:, :target_length]
    return y.reshape(shape[:-1] + (target_length,))
