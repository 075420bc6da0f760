"""WavTokenizer, TPU-native.

Single-codebook codec: EnCodec-style SEANet encoder (24 kHz, hop 320 for the
40 Hz variant / 600 for 75 Hz... configured via ratios) → one 4096-entry VQ →
Vocos-style ConvNeXt+ISTFT decode head. Replaces the reference's wrapper
around the ``novateur/WavTokenizer`` checkpoints (reference
``audiocodecs/wavtokenizer.py:30-167``; it prunes the nested EnCodec
encoder/decoder the same way, ``:78-82``).

Architecture per the public WavTokenizer release (EnCodec-style feature
extractor + Vocos head). Checkpoint conversion needs the released ckpt at
runtime; structural tests cover the JAX side.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp  # noqa: F401 (jax.Array annotations)

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.seanet import (
    SEANetConfig,
    apply_encoder,
    init_seanet_params,
    seanet_encoder_plan,
)
from audiocodecs_tpu.nn.vocos import VocosConfig, apply_vocos, init_vocos_params
from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["WavTokenizer", "WavTokenizerModelConfig"]


@dataclasses.dataclass(frozen=True)
class WavTokenizerModelConfig:
    sampling_rate: int = 24000
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 512
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)  # hop 320 → 75 Hz
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    num_lstm_layers: int = 2
    use_causal_conv: bool = True
    pad_mode: str = "reflect"
    codebook_size: int = 4096
    codebook_dim: int = 512
    # Vocos head
    vocos_dim: int = 768
    vocos_intermediate_dim: int = 2304
    vocos_layers: int = 12
    n_fft: int = 1280
    hop_length: int = 320

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
        )

    def vocos(self) -> VocosConfig:
        return VocosConfig(
            input_channels=self.codebook_dim,
            dim=self.vocos_dim,
            intermediate_dim=self.vocos_intermediate_dim,
            num_layers=self.vocos_layers,
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            num_adanorm_embeddings=None,
        )


class WavTokenizer(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 24000):
        return WavTokenizerModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 24000,
        mode: str = "reconstruct",
        num_codebooks: int = 1,
        model_config: Optional[WavTokenizerModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 1:
            raise ValueError("WavTokenizer is single-codebook (K=1)")
        self.model_config = model_config or WavTokenizerModelConfig(
            sampling_rate=orig_sample_rate
        )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=1,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_wavtokenizer_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "vocos"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    def _sig_to_feats(self, params, sig, length):
        del length
        return apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet()
        )

    def _sig_to_toks(self, params, sig, length):
        feats = self._sig_to_feats(params, sig, length)
        return vq_encode(feats, params["codebook"])[..., None]

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return vq_decode(toks[..., 0], params["codebook"])

    def _toks_to_qfeats(self, params, toks, length):
        return vq_decode(toks[..., 0], params["codebook"])

    def _toks_to_sig(self, params, toks, length):
        q = vq_decode(toks[..., 0], params["codebook"])
        return apply_vocos(params["vocos"], q, self.model_config.vocos())

    def _feats_to_sig(self, params, feats, length):
        return apply_vocos(params["vocos"], feats, self.model_config.vocos())

    def embs(self) -> jax.Array:
        return self.params["codebook"][None]  # [1, C, H]


def init_wavtokenizer_params(key, cfg: WavTokenizerModelConfig):
    k1, k2, k3 = jax.random.split(key, 3)
    sea = cfg.seanet()
    return {
        "encoder": init_seanet_params(k1, sea, seanet_encoder_plan(sea)),
        "codebook": jax.random.normal(k2, (cfg.codebook_size, cfg.codebook_dim)),
        "vocos": init_vocos_params(k3, cfg.vocos()),
    }
