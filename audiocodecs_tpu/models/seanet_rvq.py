"""Generic SEANet-encoder/decoder + RVQ codec.

Several reference zoo families are architectural variants of the same
pattern — conv SEANet stacks around a residual VQ, differing only in rates,
ratios, dims, causality, and an optional projector between encoder and
quantizer:

  * PAST — EnCodec-style RVQ at 16 kHz (+ streamable causal variant);
    reference ``audiocodecs/past.py:30-150`` (quantizer.n_q selects K).
  * AudioDec — symmetric AE, hop 300 @ 24 kHz, projector to 64-d codebooks;
    reference ``audiocodecs/audiodec.py:30-159`` (truncates RVQ layers).

This module provides the shared class; the family modules pin default
configs. Checkpoint conversion for these vendors requires their released
checkpoints at runtime (no offline oracle); structure is validated by the
zoo self-tests.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import conv1d
from audiocodecs_tpu.nn.seanet import (
    SEANetConfig,
    apply_decoder,
    apply_encoder,
    init_seanet_params,
    seanet_decoder_plan,
    seanet_encoder_plan,
)
from audiocodecs_tpu.quant.rvq import rvq_decode, rvq_encode

__all__ = ["SEANetRVQConfig", "SEANetRVQCodec"]


@dataclasses.dataclass(frozen=True)
class SEANetRVQConfig:
    sampling_rate: int = 16000
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 128  # encoder output dim
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
    codebook_size: int = 1024
    codebook_dim: int = 128  # may differ from hidden_size → projector convs
    num_quantizers: int = 8

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
        )

    @property
    def has_projector(self) -> bool:
        return self.codebook_dim != self.hidden_size


class SEANetRVQCodec(Codec):
    """SEANet encoder → (projector) → RVQ → (unprojector) → SEANet decoder."""

    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return SEANetRVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR
        )

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: int = 8,
        model_config: Optional[SEANetRVQConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        orig_sample_rate = orig_sample_rate or self.DEFAULT_ORIG_SR
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate
        )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_seanet_rvq_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if k not in ("decoder", "out_proj")}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("encoder", "in_proj")}
        super().__init__(cfg, params)

    def _sig_to_feats(self, params, sig, length):
        del length
        return apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet()
        )

    def _project(self, params, feats):
        if "in_proj" in params:
            return conv1d(feats, params["in_proj"]["w"], params["in_proj"]["b"])
        return feats

    def _unproject(self, params, q):
        if "out_proj" in params:
            return conv1d(q, params["out_proj"]["w"], params["out_proj"]["b"])
        return q

    def _sig_to_toks(self, params, sig, length):
        feats = self._project(params, self._sig_to_feats(params, sig, length))
        return rvq_encode(feats, params["codebooks"], self.config.num_codebooks)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_qfeats(self, params, toks, length):
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_sig(self, params, toks, length):
        q = self._unproject(params, rvq_decode(toks, params["codebooks"]))
        return apply_decoder(
            params["decoder"], q, self.model_config.seanet()
        )[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        return apply_decoder(
            params["decoder"], feats, self.model_config.seanet()
        )[:, :, 0]

    def embs(self) -> jax.Array:
        return self.params["codebooks"][: self.config.num_codebooks]

    # Streaming (chunked-causal) API — valid for causal configs; exact
    # batch parity for pad_mode="constant" (AudioDec/HILCodec), zero-context
    # start for reflect-padded ones (PAST).

    @property
    def frame_size(self) -> int:
        out = 1
        for r in self.model_config.upsampling_ratios:
            out *= r
        return out

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
        x = self._project(params, x)
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
        q = self._unproject(params, rvq_decode(toks, params["codebooks"]))
        y, new_state["decoder"] = apply_plan_streaming(
            q, params["decoder"], seanet_decoder_plan(sea), sea,
            state["decoder"],
        )
        return y[:, :, 0], new_state


def init_seanet_rvq_params(key, cfg: SEANetRVQConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sea = cfg.seanet()
    params = {
        "encoder": init_seanet_params(k1, sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(k2, sea, seanet_decoder_plan(sea)),
        "codebooks": jax.random.normal(
            k3, (cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim)
        ),
    }
    if cfg.has_projector:
        params["in_proj"] = {
            "w": jax.random.normal(k4, (1, cfg.hidden_size, cfg.codebook_dim))
            * cfg.hidden_size**-0.5,
            "b": jnp.zeros((cfg.codebook_dim,)),
        }
        params["out_proj"] = {
            "w": jax.random.normal(k5, (1, cfg.codebook_dim, cfg.hidden_size))
            * cfg.codebook_dim**-0.5,
            "b": jnp.zeros((cfg.hidden_size,)),
        }
    return params
