"""SpeechTokenizer, TPU-native.

First-party JAX implementation of the SpeechTokenizer architecture
(EnCodec-style SEANet with a **bidirectional** encoder LSTM + 8-stage RVQ
whose first codebook is semantically distilled; 16 kHz, hop 320). Replaces
the reference's wrapper around the ``speechtokenizer`` vendor package
(reference ``audiocodecs/speechtokenizer.py:30-157``; the vendor encode
returns ``[K, B, N]``, normalized here to the uniform ``[B, N, K]``).

Architecture recovered from the public SpeechTokenizer release
(fnlp/SpeechTokenizer ``speechtokenizer_hubert_avg``): n_filters 64, strides
(8, 5, 4, 2), latent ``dimension`` 1024, non-causal convs, 2-layer
bidirectional encoder LSTM (output 2·C with duplicated-input skip), plain
decoder LSTM, RVQ with 8 × 1024 × 1024 codebooks.

Checkpoint conversion: :mod:`audiocodecs_tpu.convert.speechtokenizer`
(weight-norm folding + layout moves). Golden-token validation against the
vendor package requires its checkpoint at runtime (no oracle is bundled in
this environment) — structural/self-consistency tests cover the JAX side.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp  # noqa: F401 (jax.Array annotations)

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

__all__ = ["SpeechTokenizer", "SpeechTokenizerModelConfig"]


@dataclasses.dataclass(frozen=True)
class SpeechTokenizerModelConfig:
    sampling_rate: int = 16000
    audio_channels: int = 1
    num_filters: int = 64
    hidden_size: int = 1024  # latent ("dimension")
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    num_lstm_layers: int = 2
    use_causal_conv: bool = False
    pad_mode: str = "reflect"
    codebook_size: int = 1024
    codebook_dim: int = 1024
    num_quantizers: int = 8

    def seanet(self, bidirectional: bool) -> SEANetConfig:
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
            use_conv_shortcut=True,
            lstm_bidirectional=bidirectional,
        )


class SpeechTokenizer(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        return SpeechTokenizerModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: int = 8,
        model_config: Optional[SpeechTokenizerModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        self.model_config = model_config or SpeechTokenizerModelConfig(
            sampling_rate=orig_sample_rate
        )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_speechtokenizer_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    def _sig_to_feats(self, params, sig, length):
        del length
        return apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet(True)
        )

    def _sig_to_toks(self, params, sig, length):
        feats = self._sig_to_feats(params, sig, length)
        return rvq_encode(feats, params["codebooks"], self.config.num_codebooks)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_qfeats(self, params, toks, length):
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_sig(self, params, toks, length):
        q = rvq_decode(toks, params["codebooks"])
        return apply_decoder(
            params["decoder"], q, self.model_config.seanet(False)
        )[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        return apply_decoder(
            params["decoder"], feats, self.model_config.seanet(False)
        )[:, :, 0]

    def embs(self) -> jax.Array:
        """``[K, C, H]`` RVQ codebooks (reference builds the same via
        per-layer decode sweeps, ``speechtokenizer.py:69-85``)."""
        return self.params["codebooks"][: self.config.num_codebooks]


def init_speechtokenizer_params(key, cfg: SpeechTokenizerModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    enc = cfg.seanet(True)
    dec = cfg.seanet(False)
    return {
        "encoder": init_seanet_params(k1, enc, seanet_encoder_plan(enc)),
        "decoder": init_seanet_params(k2, dec, seanet_decoder_plan(dec)),
        "codebooks": jax.random.normal(
            k3, (cfg.num_quantizers, cfg.codebook_size, cfg.codebook_dim)
        ),
    }
