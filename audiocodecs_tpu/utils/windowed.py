"""Windowed codec inference for long audio.

The reference handles long inputs with windowed inference + overlap-add
(SemantiCodec decodes token windows with ``SEGMENT_OVERLAP_RATIO`` crossfade,
reference ``semanticodec.py:224-261``; its encoder runs 1024-frame mel
windows, ``:273-285``). This generic utility applies the same scheme to ANY
codec in the zoo:

  * encode: fixed-size windows (static shapes → one jit compilation), hop =
    window − overlap; per-window token grids are trimmed to the hop region;
  * decode/reconstruct: per-window waveforms are crossfaded (linear ramps)
    over the overlap — click-free seams;
  * for causal codecs, prefer the native streaming API
    (``encode_chunk``/``decode_chunk``) which is exact; windowing is the
    tool for non-causal codecs (SpeechTokenizer, BigCodec, SemantiCodec, …).
"""

from __future__ import annotations

import numpy as np

__all__ = ["windowed_reconstruct"]


def windowed_reconstruct(codec, sig: np.ndarray, window_seconds: float = 10.0,
                         overlap_ratio: float = 0.1) -> np.ndarray:
    """Reconstruct arbitrarily long audio ``[B, T]`` through fixed windows.

    Each window runs the codec's jitted roundtrip (one compiled shape);
    outputs are linearly crossfaded over the overlap region.
    """
    import jax.numpy as jnp

    sr = codec.sample_rate
    window = int(window_seconds * sr)
    overlap = int(window * overlap_ratio)
    hop = window - overlap
    B, T = sig.shape
    if T <= window:
        toks = codec.sig_to_toks(jnp.asarray(sig))
        return np.asarray(codec.toks_to_sig(toks))[:, :T]

    out = np.zeros((B, T + window), np.float64)
    weight = np.zeros((T + window,), np.float64)

    starts = []
    for start in range(0, T, hop):
        starts.append(start)
        if start + window >= T:
            break

    def window_ramp(start: int) -> np.ndarray:
        """Crossfade ramp for the window at ``start``: the FIRST window's
        head and the LAST window's tail are flat 1 — there is no
        neighboring window to fade with, and a 0-weighted first sample
        would otherwise be forced to zero."""
        ramp = np.ones(window)
        if overlap > 0:
            if start != starts[0]:
                ramp[:overlap] = np.linspace(0.0, 1.0, overlap,
                                             endpoint=False)
            if start != starts[-1]:
                ramp[-overlap:] = np.linspace(1.0, 0.0, overlap,
                                              endpoint=False)
        return ramp

    def accumulate(rec: np.ndarray, start: int) -> None:
        n = min(rec.shape[1], window)
        ramp = window_ramp(start)
        out[:, start : start + n] += rec[:, :n] * ramp[:n]
        weight[start : start + n] += ramp[:n]

    # Double-buffered schedule for arbitrarily long audio: window i+1's
    # host→device transfer and dispatch are issued BEFORE window i's result
    # is fetched, so the device computes while the host moves data (JAX
    # async dispatch) — on a remote-TPU tunnel this also hides the
    # per-dispatch RTT. Output is bit-identical to the serial loop.
    pending: list = []
    for start in starts:
        chunk = sig[:, start : start + window]
        pad = window - chunk.shape[1]
        if pad:
            chunk = np.pad(chunk, ((0, 0), (0, pad)))
        toks = codec.sig_to_toks(jnp.asarray(chunk.astype(np.float32)))
        pending.append((start, codec.toks_to_sig(toks)))
        if len(pending) > 1:
            s0, rec0 = pending.pop(0)
            accumulate(np.asarray(rec0), s0)
    for s0, rec0 in pending:
        accumulate(np.asarray(rec0), s0)
    out = out[:, :T] / np.maximum(weight[:T], 1e-8)
    return out.astype(np.float32)
