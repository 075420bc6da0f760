"""Generic single-codebook (K=1) VQ codec with projected low-dim search.

Covers the reference's "one big codebook" families:

  * BigCodec — 16 kHz, C=8192, 8-d codebook behind in/out projections;
    reference ``audiocodecs/bigcodec.py:30-159`` (separate
    encoder/decoder/quantizer members; ``latent`` flag flips ``embs()``
    pre/post ``out_proj`` at ``:76-85``).
  * MagiCodec — 16 kHz, C=131072, 16-d codebook; reference
    ``audiocodecs/magicodec.py:30-146``.

The nearest-neighbor search runs in the projected low-dim space — one
``[B·N, D] @ [D, C]`` matmul even for 131k-entry codebooks (2 MB row scores
per frame-batch tile on the MXU).
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
from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["SingleVQConfig", "SingleVQCodec", "BigCodec", "MagiCodec"]


@dataclasses.dataclass(frozen=True)
class SingleVQConfig:
    sampling_rate: int = 16000
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 512
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    num_lstm_layers: int = 0
    use_causal_conv: bool = False
    pad_mode: str = "reflect"
    codebook_size: int = 8192
    codebook_dim: int = 8
    l2_normalized: bool = True  # cosine search in projected space

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


class SingleVQCodec(Codec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return SingleVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR
        )

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: int = 1,
        latent: bool = False,
        model_config: Optional[SingleVQConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 1:
            raise ValueError(f"{type(self).__name__} is single-codebook (K=1)")
        orig_sample_rate = orig_sample_rate or self.DEFAULT_ORIG_SR
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate
        )
        self.latent = latent
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=1,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_single_vq_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("encoder", "in_proj")}
        super().__init__(cfg, params)

    def _encode_z(self, params, sig):
        feats = apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet()
        )
        return conv1d(feats, params["in_proj"]["w"], params["in_proj"]["b"])

    def _sig_to_feats(self, params, sig, length):
        del length
        if self.latent:
            return self._encode_z(params, sig)
        return apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet()
        )

    def _quantize(self, params, z):
        cb = params["codebook"]
        if self.model_config.l2_normalized:
            from audiocodecs_tpu.nn.layers import unit_norm

            idx = jnp.argmax(
                jnp.einsum("bnd,cd->bnc", unit_norm(z), unit_norm(cb),
                           precision=jax.lax.Precision.HIGHEST),
                axis=-1,
            ).astype(jnp.int32)
        else:
            idx = vq_encode(z, cb)
        return idx

    def _sig_to_toks(self, params, sig, length):
        z = self._encode_z(params, sig)
        return self._quantize(params, z)[..., None]

    def _toks_to_latents(self, params, toks):
        return vq_decode(toks[..., 0], params["codebook"])

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        q = self._toks_to_latents(params, toks)
        if self.latent:
            return q
        return conv1d(q, params["out_proj"]["w"], params["out_proj"]["b"])

    def _toks_to_qfeats(self, params, toks, length):
        q = self._toks_to_latents(params, toks)
        if self.latent:
            return q
        return conv1d(q, params["out_proj"]["w"], params["out_proj"]["b"])

    def _toks_to_sig(self, params, toks, length):
        q = self._toks_to_latents(params, toks)
        h = conv1d(q, params["out_proj"]["w"], params["out_proj"]["b"])
        return apply_decoder(
            params["decoder"], h, self.model_config.seanet()
        )[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        return apply_decoder(
            params["decoder"], feats, self.model_config.seanet()
        )[:, :, 0]

    def embs(self) -> jax.Array:
        """``[1, C, D]`` raw codebook (latent) or ``[1, C, H]`` post-
        projection (reference ``bigcodec.py:76-85``)."""
        cb = self.params["codebook"]
        if self.latent or "out_proj" not in self.params:
            return cb[None]
        out = conv1d(cb[None], self.params["out_proj"]["w"],
                     self.params["out_proj"]["b"])
        return out


class BigCodec(SingleVQCodec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return SingleVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            num_filters=48,
            hidden_size=512,
            upsampling_ratios=(8, 5, 4, 2),  # hop 320 → 50 Hz
            codebook_size=8192,
            codebook_dim=8,
        )


class MagiCodec(SingleVQCodec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return SingleVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            num_filters=48,
            hidden_size=512,
            upsampling_ratios=(8, 5, 4, 2),
            codebook_size=131072,
            codebook_dim=16,
        )


def init_single_vq_params(key, cfg: SingleVQConfig):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    sea = cfg.seanet()
    return {
        "encoder": init_seanet_params(k1, sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(k2, sea, seanet_decoder_plan(sea)),
        "codebook": jax.random.normal(k3, (cfg.codebook_size, cfg.codebook_dim)),
        "in_proj": {
            "w": jax.random.normal(k4, (1, cfg.hidden_size, cfg.codebook_dim))
            * cfg.hidden_size**-0.5,
            "b": jnp.zeros((cfg.codebook_dim,)),
        },
        "out_proj": {
            "w": jax.random.normal(k5, (1, cfg.codebook_dim, cfg.hidden_size))
            * cfg.codebook_dim**-0.5,
            "b": jnp.zeros((cfg.hidden_size,)),
        },
    }
