"""EnCodec, TPU-native.

First-party JAX implementation of the EnCodec neural codec (SEANet conv
encoder/decoder + residual LSTM bottleneck + RVQ), weight-compatible with the
``facebook/encodec_{24,48}khz`` PyTorch checkpoints. Replaces the reference's
wrapper around HF ``EncodecModel`` (reference ``audiocodecs/encodec.py:30-149``)
with an end-to-end jitted XLA program: resample → encoder → RVQ → tokens,
tokens → RVQ-decode → decoder → resample.

API parity (vs reference ``encodec.py``):
  * ``num_codebooks`` selects the first K RVQ stages
    (bandwidth = K·75/100 in the reference, ``encodec.py:50``).
  * tokens are ``[B, N, K]``; ``embs()`` returns ``[K, C, H]``
    (``encodec.py:74-79``).
  * 24 kHz model: non-chunked, non-normalized encode; 48 kHz adds windowed
    chunking (``chunk_length_s``/``overlap``) with per-chunk loudness
    normalization and triangle-weighted overlap-add decode. NOTE: the
    reference wrapper truncates chunked models to the FIRST chunk
    (``encodec.py:94`` takes ``audio_codes[0]``); here the full multi-chunk
    path is implemented (all chunks batched into one encoder/decoder call).
    Trailing partial chunks are zero-padded to the full window (static
    shapes) instead of HF's shorter-frame encode + zero-token pad, so tokens
    match HF exactly on every chunk that lies fully inside the signal.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.seanet import (
    SEANetConfig,
    apply_decoder,
    apply_encoder,
    init_seanet_params,
    seanet_decoder_plan,
    seanet_encoder_plan,
)
from audiocodecs_tpu.quant.rvq import rvq_decode, rvq_encode

__all__ = ["Encodec", "EncodecModelConfig"]


@dataclasses.dataclass(frozen=True)
class EncodecModelConfig:
    """Architecture hyperparameters (defaults = encodec_24khz checkpoint)."""

    sampling_rate: int = 24000
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 128
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    num_lstm_layers: int = 2
    use_causal_conv: bool = True
    pad_mode: str = "reflect"
    use_conv_shortcut: bool = True
    trim_right_ratio: float = 1.0
    normalize: bool = False
    chunk_length_s: Optional[float] = None
    overlap: Optional[float] = None
    codebook_size: int = 1024
    codebook_dim: int = 128
    num_quantizers: int = 32

    @property
    def chunk_length(self) -> Optional[int]:
        if self.chunk_length_s is None:
            return None
        return int(self.chunk_length_s * self.sampling_rate)

    @property
    def chunk_stride(self) -> Optional[int]:
        if self.chunk_length_s is None:
            return self.chunk_length
        return max(1, int((1.0 - (self.overlap or 0.0)) * self.chunk_length))

    def seanet(self) -> SEANetConfig:
        return SEANetConfig(
            audio_channels=self.audio_channels,
            num_filters=self.num_filters,
            hidden_size=self.hidden_size,
            ratios=self.upsampling_ratios,
            kernel_size=self.kernel_size,
            last_kernel_size=self.last_kernel_size,
            residual_kernel_size=self.residual_kernel_size,
            dilation_growth_rate=self.dilation_growth_rate,
            num_residual_layers=self.num_residual_layers,
            compress=self.compress,
            num_lstm_layers=self.num_lstm_layers,
            causal=self.use_causal_conv,
            pad_mode=self.pad_mode,
            use_conv_shortcut=self.use_conv_shortcut,
            trim_right_ratio=self.trim_right_ratio,
        )

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.upsampling_ratios:
            out *= r
        return out


class Encodec(Codec):
    """EnCodec codec with the standardized ``[B,T]`` ↔ ``[B,N,K]`` contract."""

    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 24000):
        return EncodecModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 24000,
        mode: str = "reconstruct",
        num_codebooks: int = 8,
        use_vocos: bool = False,
        vocos_config=None,
        model_config: Optional[EncodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        self.model_config = model_config or EncodecModelConfig(
            sampling_rate=orig_sample_rate
        )
        # Optional Vocos decode path replacing the SEANet decoder
        # (reference ``encodec.py:52-66,130-138``): bandwidth_id indexes
        # {1.5, 3, 6, 12} kbps for AdaLayerNorm conditioning.
        self.use_vocos = use_vocos
        self.vocos_config = None
        self._bandwidth_id = 0
        if use_vocos:
            if self.model_config.chunk_length is not None:
                raise ValueError(
                    "use_vocos does not compose with windowed chunking "
                    "(chunk_length_s): overlapped token windows are not a "
                    "contiguous stream. Use the SEANet overlap-add decoder."
                )
            from audiocodecs_tpu.nn.vocos import VocosConfig

            self.vocos_config = vocos_config or VocosConfig(
                input_channels=self.model_config.codebook_dim
            )
            bandwidth = num_codebooks * 75 / 100
            try:
                self._bandwidth_id = [1.5, 3.0, 6.0, 12.0].index(bandwidth)
            except ValueError:
                raise ValueError(
                    f"use_vocos supports num_codebooks ∈ {{2,4,8,16}}, "
                    f"got {num_codebooks}"
                )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_encodec_params(
                key if key is not None else jax.random.PRNGKey(0), self.model_config
            )
            if use_vocos:
                from audiocodecs_tpu.nn.vocos import init_vocos_params

                params["vocos"] = init_vocos_params(
                    jax.random.PRNGKey(1), self.vocos_config
                )
        params = prune_params_for_mode(params, mode, use_vocos=use_vocos)
        super().__init__(cfg, params)

    # Pure functions ---------------------------------------------------- #

    def _encode_feats(self, params, sig, length):
        del length  # masking is caller-side padding; encode is causal
        if self.model_config.normalize:
            # Loudness normalization (48 kHz model): scale by the mono RMS.
            # The reference wrapper discards the scale on decode
            # (``encodec.py:139`` passes ``[None]``), so tokens — the parity
            # target — are computed on the normalized signal.
            scale = jnp.sqrt(jnp.mean(sig**2, axis=-1, keepdims=True)) + 1e-8
            sig = sig / scale
        x = sig[:, :, None]  # [B, T, 1]
        return apply_encoder(params["encoder"], x, self.model_config.seanet())

    def _sig_to_feats(self, params, sig, length):
        return self._encode_feats(params, sig, length)

    def _sig_to_toks(self, params, sig, length):
        if self.model_config.chunk_length is not None:
            return self._chunked_sig_to_toks(params, sig)
        feats = self._encode_feats(params, sig, length)
        return rvq_encode(feats, params["codebooks"], self.config.num_codebooks)

    # Windowed chunking (48 kHz model). The chunk count is a trace-time
    # function of the input length, so each (batch, T) bucket compiles one
    # static XLA program with ALL chunks batched through the encoder/decoder
    # at once — no Python loop over the audio at run time.

    def _chunk_frames(self, sig):
        """[B, T] → [B, n_chunks, chunk_length] (HF window layout:
        offsets ``range(0, T, stride)``, zero-padded trailing window)."""
        B, T = sig.shape
        L = self.model_config.chunk_length
        S = self.model_config.chunk_stride
        n = max(1, -(-T // S))
        total = (n - 1) * S + L
        if total > T:
            sig = jnp.pad(sig, ((0, 0), (0, total - T)))
        return jnp.stack([sig[:, i * S:i * S + L] for i in range(n)], 1)

    def _chunked_sig_to_toks(self, params, sig):
        frames = self._chunk_frames(sig)
        B, n, L = frames.shape
        x = frames.reshape(B * n, L)
        if self.model_config.normalize:
            # Per-chunk loudness scale over the full window (HF
            # ``_encode_frame``; zero padding counts toward the mean, same
            # as HF's masked full-length chunks).
            scale = jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True)) + 1e-8
            x = x / scale
        feats = apply_encoder(
            params["encoder"], x[:, :, None], self.model_config.seanet()
        )
        toks = rvq_encode(feats, params["codebooks"], self.config.num_codebooks)
        return toks.reshape(B, n * toks.shape[1], toks.shape[2])

    def _chunked_toks_to_sig(self, params, toks):
        B, N, K = toks.shape
        L = self.model_config.chunk_length
        S = self.model_config.chunk_stride
        frames_per_chunk = L // self.model_config.hop_length
        if N % frames_per_chunk != 0:
            raise ValueError(
                f"chunked decode needs N divisible by {frames_per_chunk} "
                f"frames/chunk, got N={N}"
            )
        n = N // frames_per_chunk
        q = rvq_decode(toks.reshape(B * n, frames_per_chunk, K),
                       params["codebooks"])
        sig = apply_decoder(params["decoder"], q, self.model_config.seanet())
        chunks = sig[:, :, 0].reshape(B, n, -1)
        return _linear_overlap_add(chunks, S)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_qfeats(self, params, toks, length):
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_sig(self, params, toks, length):
        if self.model_config.chunk_length is not None and not self.use_vocos:
            return self._chunked_toks_to_sig(params, toks)
        q = rvq_decode(toks, params["codebooks"])
        if self.use_vocos:
            from audiocodecs_tpu.nn.vocos import apply_vocos

            return apply_vocos(
                params["vocos"], q, self.vocos_config,
                cond_id=self._bandwidth_id,
            )
        sig = apply_decoder(params["decoder"], q, self.model_config.seanet())
        return sig[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        sig = apply_decoder(params["decoder"], feats, self.model_config.seanet())
        return sig[:, :, 0]

    def embs(self) -> jax.Array:
        """``[K, C, H]`` codebook embeddings (reference ``encodec.py:74-79``)."""
        return self.params["codebooks"][: self.config.num_codebooks]

    # ------------------------------------------------------------------ #
    # Streaming (chunked-causal) API — causal configs only. Note: batch
    # mode uses reflect padding at the signal start; streaming starts from
    # zero context, so the first ~kernel of tokens can differ from batch
    # mode (exactly equal for pad_mode="constant" configs).
    # ------------------------------------------------------------------ #

    @property
    def frame_size(self) -> int:
        return self.model_config.hop_length

    def init_streaming_state(self, batch: int):
        from audiocodecs_tpu.nn.seanet import (
            init_stream_state,
            seanet_decoder_plan,
            seanet_encoder_plan,
        )

        sea = self.model_config.seanet()
        state = {}
        if "encoder" in self.params:
            state["encoder"] = init_stream_state(
                self.params["encoder"], seanet_encoder_plan(sea), sea, batch
            )
        if "decoder" in self.params:
            state["decoder"] = init_stream_state(
                self.params["decoder"], seanet_decoder_plan(sea), sea, batch
            )
        return state

    def encode_chunk(self, chunk: jax.Array, state):
        return self._jitted("_encode_chunk")(self.params, chunk, state)

    def _encode_chunk(self, params, chunk, state):
        from audiocodecs_tpu.nn.seanet import (
            apply_plan_streaming,
            seanet_encoder_plan,
        )

        sea = self.model_config.seanet()
        new_state = dict(state)
        x, new_state["encoder"] = apply_plan_streaming(
            chunk[:, :, None], params["encoder"], seanet_encoder_plan(sea),
            sea, state["encoder"],
        )
        toks = rvq_encode(x, params["codebooks"], self.config.num_codebooks)
        return toks, new_state

    def decode_chunk(self, toks: jax.Array, state):
        return self._jitted("_decode_chunk")(self.params, toks, state)

    def _decode_chunk(self, params, toks, state):
        from audiocodecs_tpu.nn.seanet import (
            apply_plan_streaming,
            seanet_decoder_plan,
        )

        sea = self.model_config.seanet()
        new_state = dict(state)
        q = rvq_decode(toks, params["codebooks"])
        y, new_state["decoder"] = apply_plan_streaming(
            q, params["decoder"], seanet_decoder_plan(sea), sea,
            state["decoder"],
        )
        return y[:, :, 0], new_state


def _linear_overlap_add(chunks: jax.Array, stride: int) -> jax.Array:
    """Triangle-weighted overlap-add (HF ``_linear_overlap_add``,
    modeling_encodec.py): weight peaks mid-chunk; the final division by the
    summed weights makes the crossfade linear wherever two chunks overlap
    and a no-op where one chunk covers a position alone.

    ``chunks``: [B, n, L] decoded windows at offsets ``i·stride``."""
    B, n, L = chunks.shape
    t = (jnp.arange(1, L + 1, dtype=chunks.dtype)) / (L + 1)
    w = 0.5 - jnp.abs(t - 0.5)
    total = stride * (n - 1) + L
    out = jnp.zeros((B, total), chunks.dtype)
    wsum = jnp.zeros((total,), chunks.dtype)
    for i in range(n):  # n is static at trace time
        out = out.at[:, i * stride:i * stride + L].add(w * chunks[:, i])
        wsum = wsum.at[i * stride:i * stride + L].add(w)
    return out / wsum


def init_encodec_params(key, cfg: EncodecModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    sea = cfg.seanet()
    return {
        "encoder": init_seanet_params(k1, sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(k2, sea, seanet_decoder_plan(sea)),
        "codebooks": jax.random.normal(
            k3, (cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim)
        ),
    }


def prune_params_for_mode(params, mode: str, use_vocos: bool = False):
    """Drop unused subtrees by mode (reference prunes submodules,
    ``encodec.py:67-71``) so HBM holds only what the mode needs."""
    params = dict(params)
    if mode == "encode":
        params.pop("decoder", None)
        params.pop("vocos", None)
    elif mode == "decode":
        params.pop("encoder", None)
    if use_vocos and mode != "encode":
        # Vocos replaces the SEANet decoder entirely (encodec.py:66).
        params.pop("decoder", None)
    return params
