"""DNSMOS P.808 — first-party JAX forward (no onnxruntime).

The reference runs Microsoft's ``model_v8.onnx`` via onnxruntime over 9.01 s
windows with 1 s hops and averages the per-window MOS (reference
``metrics/dnsmos.py:45-152``). Here the same CNN runs as a jitted XLA
program — mel front-end included — from weights converted once out of the
onnx file (:mod:`audiocodecs_tpu.convert.dnsmos`); the shipped
``dnsmos_v8.npz`` next to this module holds the converted parameters.

Front-end parity target is the reference's librosa call
(``melspectrogram(n_fft=321, hop_length=160, n_mels=120)``, slaney mel
filters, ``power_to_db(ref=max)`` then ``(db + 40) / 40``), reimplemented
here from the published formulas.
"""

from __future__ import annotations

import os
from functools import lru_cache

import numpy as np

__all__ = ["dnsmos_p808", "make_dnsmos_jax_metric", "mel_filterbank_slaney",
           "DEFAULT_PARAMS_PATH"]

SAMPLE_RATE = 16000
INPUT_LENGTH = 9.01
N_FFT = 321
HOP = 160
N_MELS = 120
SEG = int(INPUT_LENGTH * SAMPLE_RATE)  # 144160
MEL_SAMPLES = SEG - HOP  # mel computed over audio_seg[:-160]

DEFAULT_PARAMS_PATH = os.path.join(os.path.dirname(__file__), "dnsmos_v8.npz")


def mel_filterbank_slaney(sr: int = SAMPLE_RATE, n_fft: int = N_FFT,
                          n_mels: int = N_MELS, fmin: float = 0.0,
                          fmax: float | None = None) -> np.ndarray:
    """Slaney mel filterbank with this module's DNSMOS defaults (shared
    implementation: :mod:`audiocodecs_tpu.utils.melbank`)."""
    from audiocodecs_tpu.utils.melbank import mel_filterbank_slaney as fb

    return fb(sr, n_fft, n_mels, fmin, fmax)


@lru_cache(maxsize=2)
def _jitted_forward(params_path: str):
    import jax
    import jax.numpy as jnp
    from jax import lax

    raw = np.load(params_path)
    conv = [{"w": jnp.asarray(raw[f"conv{i}_w"]),
             "b": jnp.asarray(raw[f"conv{i}_b"])} for i in range(5)]
    dense = [{"w": jnp.asarray(raw[f"dense{i}_w"]),
              "b": jnp.asarray(raw[f"dense{i}_b"])} for i in range(3)]
    has_pool = [True, True, False, True, False]

    melfb = jnp.asarray(mel_filterbank_slaney())
    n = 2 * np.pi * np.arange(N_FFT) / N_FFT
    window = jnp.asarray(0.5 - 0.5 * np.cos(n), dtype=jnp.float32)

    def melspec(x):  # [B, MEL_SAMPLES] → [B, frames, N_MELS]
        xp = jnp.pad(x, ((0, 0), (N_FFT // 2, N_FFT // 2)))
        n_frames = 1 + (xp.shape[1] - N_FFT) // HOP
        idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_frames)[:, None]
        frames = xp[:, idx] * window[None, None, :]
        spec = jnp.fft.rfft(frames, axis=-1)
        power = spec.real**2 + spec.imag**2  # [B, F, bins]
        mel = jnp.einsum("bfn,mn->bfm", power, melfb)
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        ref = jnp.max(db, axis=(1, 2), keepdims=True)
        db = jnp.maximum(db - ref, -80.0)
        return (db + 40.0) / 40.0

    def forward(x):  # [B, MEL_SAMPLES] raw audio → [B] P.808 MOS
        h = melspec(x)[:, None, :, :]  # NCHW, C=1
        for p, pool in zip(conv, has_pool):
            h = lax.conv_general_dilated(
                h, jnp.asarray(p["w"]), window_strides=(1, 1),
                padding=((1, 1), (1, 1)),
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + p["b"][None, :, None, None]
            h = jnp.maximum(h, 0.0)
            if pool:
                h = lax.reduce_window(
                    h, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
                )
        h = jnp.max(h, axis=(2, 3))  # global max pool → [B, 64]
        for i, p in enumerate(dense):
            h = h @ p["w"] + p["b"]
            if i < 2:
                h = jnp.maximum(h, 0.0)
        return h[:, 0]

    return jax.jit(forward)


def dnsmos_p808(sig, sample_rate: int,
                params_path: str = DEFAULT_PARAMS_PATH) -> float:
    """P.808 MOS of one utterance (1-D array), reference windowing:
    tile to ≥9.01 s, slide in 1 s hops, average the per-window scores."""
    from audiocodecs_tpu.downstream.metrics.stoi import _resample_np

    x = np.asarray(sig, dtype=np.float32).reshape(-1)
    if x.size == 0:  # empty input would tile forever below
        return float("nan")
    if sample_rate != SAMPLE_RATE:
        x = _resample_np(x.astype(np.float64),
                         sample_rate, SAMPLE_RATE).astype(np.float32)
    while len(x) < SEG:
        x = np.concatenate([x, x])
    num_hops = int(np.floor(len(x) / SAMPLE_RATE) - INPUT_LENGTH) + 1
    segs = [x[i * SAMPLE_RATE : i * SAMPLE_RATE + SEG][:MEL_SAMPLES]
            for i in range(num_hops)
            if len(x[i * SAMPLE_RATE :]) >= SEG]
    if not segs:
        return float("nan")
    fwd = _jitted_forward(params_path)
    scores = np.asarray(fwd(np.stack(segs)))
    return float(scores.mean())


def make_dnsmos_jax_metric(params_path: str = DEFAULT_PARAMS_PATH):
    """MetricStats wrapper over the on-device DNSMOS (same protocol as the
    reference's ``DNSMOS`` MetricStats, ``metrics/dnsmos.py:46-85``)."""
    from audiocodecs_tpu.downstream.metrics.base import MetricStats

    if not os.path.exists(params_path):
        raise RuntimeError(
            f"DNSMOS params not found at {params_path}; run "
            "`python tools/convert_checkpoints.py convert dnsmos "
            "<model_v8.onnx> <out.npz>` first."
        )

    def metric(sigs, sample_rate: int):
        return [dnsmos_p808(np.asarray(s), sample_rate, params_path)
                for s in sigs]

    return MetricStats(metric, name="DNSMOS")


def save_dnsmos_params(onnx_path: str, out_path: str) -> dict:
    """Convert + save as flat npz (cli helper for tools/convert_checkpoints)."""
    from audiocodecs_tpu.convert.dnsmos import convert_dnsmos_onnx

    params = convert_dnsmos_onnx(onnx_path)
    flat = {}
    for i, p in enumerate(params["conv"]):
        flat[f"conv{i}_w"], flat[f"conv{i}_b"] = p["w"], p["b"]
    for i, p in enumerate(params["dense"]):
        flat[f"dense{i}_w"], flat[f"dense{i}_b"] = p["w"], p["b"]
    np.savez(out_path, **flat)
    return flat
