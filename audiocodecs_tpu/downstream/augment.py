"""Train-time waveform augmentation, jittable with explicit PRNG keys.

Reference recipes apply ``hparams.augmentation`` to the input signal before
tokenization when ``augment: True`` (reference ``train_asr.py:46-48``); the
configured chain is DropFreq + DropChunk through a SpeechBrain Augmenter
with ``min_augmentations = max_augmentations = 2`` and
``augment_prob: 0.75`` (reference ``hparams/tasks/asr.yaml:40-41,62-93``).
This module reimplements those semantics TPU-natively: static shapes (a
fixed ``count_high`` of candidate notches/chunks with an active mask),
batched FIR notches via one depthwise conv, chunk masks via
scatter-then-cumsum (no ``[count, T]`` materialization), everything under
``jax.jit``.

The reference yaml passes ``drop_length_low/high = 1/5`` and
``drop_count_low/high = 1000/2000`` into SpeechBrain's DropChunk — i.e.
1000–2000 micro-drops of 1–5 samples (the yaml comments describe the
swapped mapping, but the executed semantics are these); the defaults here
reproduce the executed behavior.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["drop_freq", "drop_chunk", "build_augmenter"]

_NOTCH_LEN = 101  # FIR length (odd, linear phase)


def _notch_kernel(freq: jax.Array, width: float) -> jax.Array:
    """Windowed-sinc band-stop at relative ``freq`` (1 = Nyquist).

    Low-pass at ``freq - width`` plus spectrally-inverted low-pass at
    ``freq + width`` (SpeechBrain ``notch_filter`` construction)."""
    pad = _NOTCH_LEN // 2
    n = jnp.arange(_NOTCH_LEN) - pad
    win = jnp.blackman(_NOTCH_LEN)

    def lp(cut):
        h = jnp.where(n == 0, 2.0 * cut,
                      jnp.sin(jnp.pi * cut * n) / (jnp.pi * n + 1e-20))
        h = h * win
        return h / jnp.sum(h)

    lo = jnp.clip(freq - width, 1e-3, 1.0)
    hi = jnp.clip(freq + width, 1e-3, 1.0)
    hlpf = lp(lo)
    hhpf = -lp(hi)
    hhpf = hhpf.at[pad].add(1.0)  # spectral inversion → high-pass
    return hlpf + hhpf


@functools.partial(
    jax.jit, static_argnames=("freq_low", "freq_high", "count_low",
                              "count_high", "width"))
def drop_freq(sig: jax.Array, key: jax.Array, *,
              freq_low: float = 0.0, freq_high: float = 1.0,
              count_low: int = 1, count_high: int = 3,
              width: float = 0.05) -> jax.Array:
    """Randomly notch 1..count_high frequency bands per batch element.

    ``sig``: [B, T]. Per element, ``count ∈ [count_low, count_high]``
    notch filters at relative frequencies ``∈ [freq_low, freq_high]``
    (× Nyquist) are composed into ONE FIR kernel (inactive slots are
    identity), applied with a single depthwise conv.
    """
    B, T = sig.shape
    k1, k2 = jax.random.split(key)
    freqs = jax.random.uniform(
        k1, (B, count_high), minval=max(freq_low, 1e-2),
        maxval=min(freq_high, 1.0 - 1e-2))
    counts = jax.random.randint(k2, (B,), count_low, count_high + 1)
    active = jnp.arange(count_high)[None, :] < counts[:, None]  # [B, n]

    # compose at FULL length so no truncation occurs: n notches of L taps
    # have support n·(L−1)+1; SpeechBrain applies each notch sequentially,
    # which equals composing into one full-length kernel.
    full_len = count_high * (_NOTCH_LEN - 1) + 1
    delta_l = jnp.zeros(_NOTCH_LEN).at[_NOTCH_LEN // 2].set(1.0)
    delta_f = jnp.zeros(full_len).at[full_len // 2].set(1.0)

    def one_kernel(fs, act):
        def body(carry, fa):
            f, a = fa
            k = jnp.where(a, _notch_kernel(f, width), delta_l)
            # carry support stays centered and ≤ full_len, so the 'same'
            # trim of the length-full_len carry is exact (no truncation)
            out = jnp.convolve(carry, k, mode="same")
            return out, None

        kern, _ = jax.lax.scan(body, delta_f, (fs, act))
        return kern

    kernels = jax.vmap(one_kernel)(freqs, active)  # [B, full_len]
    pad = full_len // 2
    x = jnp.pad(sig, ((0, 0), (pad, pad))).T[None]  # NHC: [1, T+2p, B]
    w = kernels.T[:, None, :]  # [L, 1, B] (HIO, depthwise)
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=B)
    return jnp.transpose(y[0], (1, 0))  # [B, T]


@functools.partial(
    jax.jit,
    static_argnames=("length_low", "length_high", "count_low", "count_high"))
def drop_chunk(sig: jax.Array, key: jax.Array,
               lengths: jax.Array | None = None, *,
               length_low: int = 1, length_high: int = 5,
               count_low: int = 1000, count_high: int = 2000) -> jax.Array:
    """Zero random chunks: per element ``count ∈ [count_low, count_high]``
    chunks of ``length ∈ [length_low, length_high]`` samples.

    Mask built as +1/−1 boundary scatters followed by a cumulative sum —
    O(count + T), never materializing a ``[count, T]`` grid. ``lengths``
    ([B] valid sample counts) confines chunks to the valid region.
    """
    B, T = sig.shape
    k1, k2, k3 = jax.random.split(key, 3)
    valid = (jnp.full((B,), T) if lengths is None
             else jnp.asarray(lengths)).astype(jnp.int32)
    counts = jax.random.randint(k1, (B,), count_low, count_high + 1)
    lens = jax.random.randint(
        k2, (B, count_high), length_low, length_high + 1)
    u = jax.random.uniform(k3, (B, count_high))
    max_start = jnp.maximum(valid[:, None] - lens, 1)
    starts = (u * max_start).astype(jnp.int32)
    active = jnp.arange(count_high)[None, :] < counts[:, None]
    ends = jnp.minimum(starts + lens, valid[:, None])

    def one_mask(st, en, act):
        inc = jnp.zeros(T + 1, jnp.int32)
        inc = inc.at[jnp.where(act, st, T)].add(1, mode="drop")
        inc = inc.at[jnp.where(act, en, T)].add(-1, mode="drop")
        return jnp.cumsum(inc[:T]) > 0  # True inside a dropped chunk

    dropped = jax.vmap(one_mask)(starts, ends, active)
    return jnp.where(dropped, 0.0, sig)


def build_augmenter(cfg: dict):
    """Augmentation chain from recipe config keys (reference Augmenter:
    both augmentations applied sequentially, per-example gating with
    ``augment_prob`` — ``asr.yaml:78-93``).

    Returns ``fn(sig [B, T], key, lengths=None) -> [B, T]``; identity for
    elements that lose the ``augment_prob`` coin flip.
    """
    prob = float(cfg.get("augment_prob", 0.75))
    df = dict(freq_low=float(cfg.get("drop_freq_low", 0.0)),
              freq_high=float(cfg.get("drop_freq_high", 1.0)),
              count_low=int(cfg.get("drop_freq_count_low", 1)),
              count_high=int(cfg.get("drop_freq_count_high", 3)),
              width=float(cfg.get("drop_freq_width", 0.05)))
    dc = dict(length_low=int(cfg.get("drop_length_low", 1)),
              length_high=int(cfg.get("drop_length_high", 5)),
              count_low=int(cfg.get("drop_count_low", 1000)),
              count_high=int(cfg.get("drop_count_high", 2000)))

    def augment(sig, key, lengths=None):
        kf, kc, kp = jax.random.split(key, 3)
        aug = drop_freq(sig, kf, **df)
        aug = drop_chunk(aug, kc, lengths, **dc)
        keep = jax.random.bernoulli(kp, prob, (sig.shape[0], 1))
        return jnp.where(keep, aug, sig)

    return augment
