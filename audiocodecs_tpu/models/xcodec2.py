"""X-Codec 2.0, TPU-native.

Single-token codec with a **dual branch**: an acoustic conv encoder and a
semantic SSL branch, fused and quantized by a 65536-entry FSQ lattice
(16 bits = 8 dims × 4 levels), decoded by a conv/vocoder stack. Replaces the
reference's wrapper around ``HKUST-Audio/xcodec2`` (reference
``audiocodecs/xcodec2.py:30-157``: semantic-model + codec-encoder dual
branch pruning at ``:56-62``; FSQ ``_indices_to_codes`` drives ``embs()`` at
``:66-71``; K = 1 asserted, C = 65536).

The upstream semantic branch is a Wav2Vec2-BERT; here the in-framework SSL
encoder (WavLM) fills that role — swap via config when a converted
Wav2Vec2-BERT lands.
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
from audiocodecs_tpu.nn.wavlm import WavLMConfig, apply_wavlm
from audiocodecs_tpu.quant.fsq import (
    fsq_codes_to_indices,
    fsq_implicit_codebook,
    fsq_indices_to_codes,
    fsq_quantize,
)

__all__ = ["XCodec2", "XCodec2ModelConfig"]


@dataclasses.dataclass(frozen=True)
class XCodec2ModelConfig:
    sampling_rate: int = 16000
    num_filters: int = 32
    hidden_size: int = 256
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    levels: tuple[int, ...] = (4, 4, 4, 4, 4, 4, 4, 4)  # 4^8 = 65536
    wavlm: WavLMConfig = dataclasses.field(default_factory=WavLMConfig)
    wavlm_layer: int = 6

    def seanet(self) -> SEANetConfig:
        return SEANetConfig(
            audio_channels=1,
            num_filters=self.num_filters,
            hidden_size=self.hidden_size,
            ratios=self.upsampling_ratios,
            num_lstm_layers=0,
            causal=False,
            pad_mode="reflect",
            use_conv_shortcut=False,
        )

    @property
    def vocab_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out


class XCodec2(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        return XCodec2ModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: int = 1,
        model_config: Optional[XCodec2ModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 1:
            raise ValueError("XCodec2 is single-codebook (K=1)")
        self.model_config = model_config or XCodec2ModelConfig(
            sampling_rate=orig_sample_rate
        )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=1,
            vocab_size=self.model_config.vocab_size,
        )
        if params is None:
            params = init_xcodec2_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if k not in ("decoder", "out_proj")}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("encoder", "wavlm", "sem_proj", "fuse",
                                   "in_proj")}
        super().__init__(cfg, params)

    def _latents(self, params, sig):
        """Dual-branch fusion → FSQ latents [B, N, D]."""
        mc = self.model_config
        ac = apply_encoder(params["encoder"], sig[:, :, None], mc.seanet())
        sem = apply_wavlm(params["wavlm"], sig, mc.wavlm,
                          output_layer=mc.wavlm_layer)
        sem = jnp.einsum("bnh,hd->bnd", sem, params["sem_proj"])
        N = min(ac.shape[1], sem.shape[1])
        fused = jnp.concatenate([ac[:, :N], sem[:, :N]], axis=-1)
        h = jnp.einsum("bnf,fh->bnh", fused, params["fuse"])
        h = jax.nn.gelu(h, approximate=False)
        return jnp.einsum("bnh,hd->bnd", h, params["in_proj"])

    def _sig_to_feats(self, params, sig, length):
        del length
        return self._latents(params, sig)

    def _sig_to_toks(self, params, sig, length):
        mc = self.model_config
        z = self._latents(params, sig)
        codes = fsq_quantize(z, mc.levels)
        return fsq_codes_to_indices(codes, mc.levels)[..., None]

    def _toks_to_qfeats(self, params, toks, length):
        return fsq_indices_to_codes(toks[..., 0], self.model_config.levels)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    def _toks_to_sig(self, params, toks, length):
        q = self._toks_to_qfeats(params, toks, length)
        h = jnp.einsum("bnd,dh->bnh", q, params["out_proj"])
        return apply_decoder(
            params["decoder"], h, self.model_config.seanet()
        )[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        mc = self.model_config
        q = fsq_quantize(feats, mc.levels)
        h = jnp.einsum("bnd,dh->bnh", q, params["out_proj"])
        return apply_decoder(params["decoder"], h, mc.seanet())[:, :, 0]

    def embs(self) -> jax.Array:
        """Materialized FSQ lattice [1, 65536, 8] (reference builds the same
        via ``_indices_to_codes``, ``xcodec2.py:66-71``)."""
        return jnp.asarray(
            fsq_implicit_codebook(self.model_config.levels)
        )[None]


def init_xcodec2_params(key, cfg: XCodec2ModelConfig):
    from audiocodecs_tpu.models.wavlm_kmeans import _init_wavlm_params

    ks = jax.random.split(key, 7)
    sea = cfg.seanet()
    H = cfg.hidden_size
    Hw = cfg.wavlm.hidden_size
    D = len(cfg.levels)
    return {
        "encoder": init_seanet_params(ks[0], sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(ks[1], sea, seanet_decoder_plan(sea)),
        "wavlm": _init_wavlm_params(ks[2], cfg.wavlm),
        "sem_proj": jax.random.normal(ks[3], (Hw, H)) * Hw**-0.5,
        "fuse": jax.random.normal(ks[4], (2 * H, H)) * (2 * H) ** -0.5,
        "in_proj": jax.random.normal(ks[5], (H, D)) * H**-0.5,
        "out_proj": jax.random.normal(ks[6], (D, H)) * D**-0.5,
    }
