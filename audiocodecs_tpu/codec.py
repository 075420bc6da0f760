"""Standardized codec interface (TPU-native).

Re-designs the reference's abstract ``Codec`` (reference
``audiocodecs/codec.py:33-214``) as a JAX-first API:

  * models are **pure functions over parameter pytrees**; the ``Codec`` object
    is a thin stateful handle that owns the params, the static config, and a
    cache of jit-compiled entry points (one per input shape — XLA requires
    static shapes, so callers should bucket lengths; see
    :func:`audiocodecs_tpu.utils.masking.pad_to_bucket`).
  * the tensor contract is identical to the reference:
    ``[B, T]`` waveforms ↔ ``[B, N, K]`` token grids ↔ ``[B, N, H]`` features,
    with relative ``length`` vectors in ``[0, 1]`` driving padding masks.
  * sample-rate conversion in/out of the codec's native rate uses the
    polyphase resampler (:mod:`audiocodecs_tpu.resample`), matching
    ``torchaudio.functional.resample`` numerics.
  * stochastic token corruption (the reference's ``Codec.resample``,
    ``codec.py:121-148``) takes an explicit PRNG key.

Shape vocabulary (mirrors reference ``codec.py:28-32``):
  B: batch — T: time samples — N: token frames — C: vocab per codebook —
  K: number of codebooks — H: feature dim.
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Any, Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.resample import resample as _resample_sig

__all__ = ["Codec", "CodecConfig", "MODES"]

MODES = ("encode", "decode", "reconstruct")


@dataclasses.dataclass(frozen=True)
class CodecConfig:
    """Static configuration shared by every codec.

    ``sample_rate`` is the user-facing I/O rate; ``orig_sample_rate`` is the
    model's native rate (reference ``codec.py:36-42``). ``mode`` prunes unused
    parameter subtrees at load time (reference wrappers null out
    encoder/decoder by mode, e.g. ``encodec.py:67-71``).
    """

    sample_rate: int
    orig_sample_rate: int
    mode: str = "reconstruct"
    num_codebooks: int = 1
    vocab_size: int = 1024
    # Heterogeneous per-codebook vocab sizes (reference
    # ``multihead.py:37-43``; e.g. SemantiCodec's semantic vs acoustic
    # codebooks, reference ``semanticodec.py:34-35,66``). ``None`` means all
    # codebooks share ``vocab_size``; otherwise a K-tuple whose max equals
    # ``vocab_size`` (the static [K, C, H] embs/logits pad to the max).
    vocab_sizes: Optional[tuple] = None

    def __post_init__(self):
        if self.mode not in MODES:
            raise ValueError(f"`mode` ({self.mode}) must be one of {list(MODES)}")
        if self.vocab_sizes is not None:
            object.__setattr__(self, "vocab_sizes",
                               tuple(int(c) for c in self.vocab_sizes))
            if len(self.vocab_sizes) != self.num_codebooks:
                raise ValueError(
                    f"{len(self.vocab_sizes)} vocab_sizes for "
                    f"{self.num_codebooks} codebooks"
                )
            if max(self.vocab_sizes) != self.vocab_size:
                raise ValueError(
                    f"max(vocab_sizes)={max(self.vocab_sizes)} must equal "
                    f"vocab_size={self.vocab_size}"
                )


class Codec(ABC):
    """Abstract standardized codec.

    Subclasses implement the pure ``_sig_to_toks`` / ``_toks_to_sig`` /
    ``_sig_to_feats`` / ``_sig_to_qfeats`` (and optionally
    ``_toks_to_qfeats`` / ``_feats_to_sig``) functions of
    ``(params, x, length)`` and an ``embs(params)`` returning ``[K, C, H]``.
    """

    def __init__(self, config: CodecConfig, params: Any):
        self.config = config
        # Commit the whole param tree to the default device once: converter
        # outputs arrive as host numpy (would re-upload per jit call —
        # ~306 MB/call for DAC-44.1k through the remote tunnel), and
        # committing eager-init arrays keeps them pinned if the default
        # device changes later. (First USE of fresh buffers still pays a
        # one-time on-device layout settle — warm before timing.)
        self.params = jax.device_put(params)
        self._logits_cache: Optional[jax.Array] = None
        self._jit_cache: dict[str, Any] = {}

    # ------------------------------------------------------------------ #
    # Public API (mirrors reference codec.py:45-119)
    # ------------------------------------------------------------------ #

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def orig_sample_rate(self) -> int:
        return self.config.orig_sample_rate

    @property
    def mode(self) -> str:
        return self.config.mode

    def __call__(self, x: jax.Array, length: Optional[jax.Array] = None):
        """Dispatch on mode: encode → toks, decode → sig, reconstruct → sig."""
        if self.mode == "encode":
            return self.sig_to_toks(x, length)
        if self.mode == "decode":
            return self.toks_to_sig(x, length)
        toks = self.sig_to_toks(x, length)
        return self.toks_to_sig(toks, length)

    def sig_to_toks(self, sig: jax.Array, length=None) -> jax.Array:
        """``[B, T]`` → ``[B, N, K]`` token grid."""
        length = self._default_length(sig, length)
        return self._jitted("_sig_to_toks")(self.params, sig, length)

    def sig_to_feats(self, sig: jax.Array, length=None) -> jax.Array:
        """``[B, T]`` → ``[B, N, H]`` pre-quantization encoder features."""
        length = self._default_length(sig, length)
        return self._jitted("_sig_to_feats")(self.params, sig, length)

    def sig_to_qfeats(self, sig: jax.Array, length=None) -> jax.Array:
        """``[B, T]`` → ``[B, N, H]`` post-quantization features."""
        length = self._default_length(sig, length)
        return self._jitted("_sig_to_qfeats")(self.params, sig, length)

    def toks_to_sig(self, toks: jax.Array, length=None) -> jax.Array:
        """``[B, N, K]`` → ``[B, T]`` waveform."""
        if length is None:
            length = jnp.ones(toks.shape[0], dtype=jnp.float32)
        return self._jitted("_toks_to_sig")(self.params, toks, length)

    def toks_to_qfeats(self, toks: jax.Array, length=None) -> jax.Array:
        """``[B, N, K]`` → ``[B, N, H]`` quantized features."""
        if length is None:
            length = jnp.ones(toks.shape[0], dtype=jnp.float32)
        return self._jitted("_toks_to_qfeats")(self.params, toks, length)

    def feats_to_sig(self, feats: jax.Array, length=None) -> jax.Array:
        """``[B, N, H]`` → ``[B, T]`` waveform (vocode from features)."""
        if length is None:
            length = jnp.ones(feats.shape[0], dtype=jnp.float32)
        return self._jitted("_feats_to_sig")(self.params, feats, length)

    # ------------------------------------------------------------------ #
    # Token corruption (reference codec.py:121-148)
    # ------------------------------------------------------------------ #

    def resample(
        self,
        toks: jax.Array,
        key: jax.Array,
        p: float = 0.2,
        temp: float = 1.0,
        top_k: Optional[int] = None,
        top_p: Optional[float] = None,
    ) -> jax.Array:
        """Stochastically corrupt tokens ``[B, N, K]``.

        With probability ``p`` per position, replace the token with a sample
        from the codebook-similarity distribution (pairwise-distance logits of
        the *current* token's row, temperature/top-k/top-p filtered) — the
        data augmentation the reference calls ``resample``.
        """
        if p <= 0.0:
            return toks
        if top_k is not None and top_p is not None:
            raise NotImplementedError("choose at most one of top_k / top_p")
        logits = self.logits()  # [K, C, C]
        k_mask, k_sample = jax.random.split(key)
        B, N, K = toks.shape
        C = logits.shape[-1]
        # Row of pairwise logits for each current token: one gather into the
        # flattened [K·C, C] table (no [B,N,K,C,C] broadcast).
        flat = logits.reshape(K * C, C)
        idx = toks.astype(jnp.int32) + (jnp.arange(K, dtype=jnp.int32) * C)[None, None]
        sel = jnp.take(flat, idx, axis=0)  # [B, N, K, C]
        sel = sel / temp
        if top_k is not None:
            kth = jnp.sort(sel, axis=-1)[..., -top_k][..., None]
            sel = jnp.where(sel < kth, -jnp.inf, sel)
        elif top_p is not None:
            probs = jax.nn.softmax(sel, axis=-1)
            order = jnp.argsort(-probs, axis=-1)
            sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
            csum = jnp.cumsum(sorted_probs, axis=-1)
            drop_sorted = (csum - sorted_probs) > top_p
            inv = jnp.argsort(order, axis=-1)
            drop = jnp.take_along_axis(drop_sorted, inv, axis=-1)
            sel = jnp.where(drop, -jnp.inf, sel)
        samples = jax.random.categorical(k_sample, sel, axis=-1)  # [B, N, K]
        mask = jax.random.uniform(k_mask, toks.shape) < p
        return jnp.where(mask, samples.astype(toks.dtype), toks)

    def logits(self) -> jax.Array:
        """Cached pairwise codebook logits ``[K, C, C]`` (−distance, −inf diag).

        Mirrors reference ``codec.py:150-159``.
        """
        if self._logits_cache is None:
            embs = self.embs()  # [K, C, H]
            d2 = (
                jnp.sum(embs**2, -1)[:, :, None]
                - 2.0 * jnp.einsum("kch,kdh->kcd", embs, embs)
                + jnp.sum(embs**2, -1)[:, None, :]
            )
            dist = jnp.sqrt(jnp.maximum(d2, 0.0))
            logits = -dist
            if self.config.vocab_sizes is not None:
                # heterogeneous vocabs: embs() zero-pads smaller codebooks
                # to C rows — mask those columns so token corruption can
                # never sample an out-of-vocab id for that codebook
                C = dist.shape[-1]
                valid = (jnp.arange(C)[None, :]
                         < jnp.asarray(self.config.vocab_sizes)[:, None])
                logits = jnp.where(valid[:, None, :], logits, -jnp.inf)
            eye = jnp.eye(dist.shape[-1], dtype=bool)[None]
            self._logits_cache = jnp.where(eye, -jnp.inf, logits)
        return self._logits_cache

    # ------------------------------------------------------------------ #
    # Subclass surface
    # ------------------------------------------------------------------ #

    @abstractmethod
    def embs(self) -> jax.Array:
        """Return the ``[K, C, H]`` codebook embedding tensor."""
        raise NotImplementedError

    @abstractmethod
    def _sig_to_toks(self, params, sig: jax.Array, length: jax.Array):
        raise NotImplementedError

    @abstractmethod
    def _sig_to_feats(self, params, sig: jax.Array, length: jax.Array):
        raise NotImplementedError

    @abstractmethod
    def _sig_to_qfeats(self, params, sig: jax.Array, length: jax.Array):
        raise NotImplementedError

    @abstractmethod
    def _toks_to_sig(self, params, toks: jax.Array, length: jax.Array):
        raise NotImplementedError

    # Optional (reference codec.py:206-214)
    def _toks_to_qfeats(self, params, toks: jax.Array, length: jax.Array):
        raise NotImplementedError

    def _feats_to_sig(self, params, feats: jax.Array, length: jax.Array):
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # Internals
    # ------------------------------------------------------------------ #

    def _default_length(self, sig: jax.Array, length):
        if length is None:
            return jnp.ones(sig.shape[0], dtype=jnp.float32)
        return jnp.asarray(length, dtype=jnp.float32)

    def jitted_roundtrip(self):
        """One jitted ``(params, sig) → sig`` encode+decode graph with the
        same resample composition as the public path.

        Params are jit ARGUMENTS (never closed over — closures bake the
        weights into the HLO as constants, which remote-compile services
        reject for large models). Shared by benchmarking and serving
        callers so they all time/serve exactly the public graph.
        """

        def roundtrip(params, sig):
            toks = self._sig_to_toks(params, self._to_native_rate(sig),
                                     None)
            return self._from_native_rate(
                self._toks_to_sig(params, toks, None))

        return jax.jit(roundtrip)

    def _jitted(self, name: str):
        """Jit-compile a subclass method once; XLA caches per input shape.

        I/O resampling (reference ``codec.py:57-119`` does it outside the
        model) is composed *inside* the jitted graph here so that the whole
        path — resample → conv stacks → quantize — is one XLA program.
        """
        if name not in self._jit_cache:
            inner = getattr(self, name)
            if name in ("_sig_to_toks", "_sig_to_feats", "_sig_to_qfeats"):

                def fn(params, x, length, _inner=inner):
                    return _inner(params, self._to_native_rate(x), length)

            elif name in ("_toks_to_sig", "_feats_to_sig"):

                def fn(params, x, length, _inner=inner):
                    return self._from_native_rate(_inner(params, x, length))

            else:
                fn = inner
            self._jit_cache[name] = jax.jit(fn)
        return self._jit_cache[name]

    # Resampling helpers shared by subclasses -------------------------- #

    def _to_native_rate(self, sig: jax.Array) -> jax.Array:
        return _resample_sig(sig, self.config.sample_rate, self.config.orig_sample_rate)

    def _from_native_rate(self, sig: jax.Array) -> jax.Array:
        return _resample_sig(sig, self.config.orig_sample_rate, self.config.sample_rate)
