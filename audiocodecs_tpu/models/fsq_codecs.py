"""FSQ-quantized codec families: NanoCodec and StableCodec.

  * NanoCodec (NVIDIA NeMo) — 22.05 kHz, 4 parallel FSQ groups (each a
    4-d lattice, 4096 codes); reference ``audiocodecs/nanocodec.py:30-159``
    (FSQ quantizers; ``embs()`` via an index sweep per FSQ at ``:66-81``,
    absolute lengths passed through at ``:84-119``).
  * StableCodec (Stability AI) — 16 kHz, **residual** FSQ with post-hoc
    bottleneck grids (1×46656 = 6⁶, 2×15625 = 5⁶, 4×729 = 3⁶); reference
    ``audiocodecs/stablecodec.py:30-181`` (input padded to 320-sample
    windows at ``:96-101``; ``embs()`` via ``indices_to_codes`` per
    quantizer at ``:76-89``). The upstream uses a transformer backbone; here
    the bottleneck rides the shared SEANet + transformer blocks.

FSQ has no codebook search at all — quantization is elementwise VPU rounding
(see :mod:`audiocodecs_tpu.quant.fsq`), so encode cost is pure conv/attention.
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
from audiocodecs_tpu.quant.fsq import (
    fsq_codes_to_indices,
    fsq_implicit_codebook,
    fsq_indices_to_codes,
    fsq_quantize,
)

__all__ = ["FSQCodecConfig", "NanoCodec", "StableCodec"]


@dataclasses.dataclass(frozen=True)
class FSQCodecConfig:
    sampling_rate: int = 22050
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
    use_causal_conv: bool = True
    pad_mode: str = "constant"
    levels: tuple[int, ...] = (8, 8, 8, 8)  # per-group lattice
    num_groups: int = 4  # parallel groups (Nano) — residual stages (Stable)
    residual: bool = False  # parallel (False) vs residual (True) FSQ

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

    @property
    def fsq_dim(self) -> int:
        return len(self.levels)

    @property
    def vocab_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out


class _FSQCodec(Codec):
    DEFAULT_ORIG_SR = 22050

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        raise NotImplementedError

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: Optional[int] = None,
        model_config: Optional[FSQCodecConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        orig_sample_rate = orig_sample_rate or self.DEFAULT_ORIG_SR
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate
        )
        num_codebooks = num_codebooks or self.model_config.num_groups
        if num_codebooks > self.model_config.num_groups:
            raise ValueError(
                f"num_codebooks {num_codebooks} > groups "
                f"{self.model_config.num_groups}"
            )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=self.model_config.vocab_size,
        )
        if params is None:
            params = init_fsq_codec_params(
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

    def _latents(self, params, sig):
        feats = apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet()
        )
        z = conv1d(feats, params["in_proj"]["w"], params["in_proj"]["b"])
        return z  # [B, N, G·D] (parallel groups) or [B, N, D] (residual)

    def _sig_to_toks(self, params, sig, length):
        mc = self.model_config
        z = self._latents(params, sig)
        B, N, _ = z.shape
        K = self.config.num_codebooks
        toks = []
        if mc.residual:
            residual = z  # [B, N, D]
            for k in range(K):
                scale = params["scales"][k]
                codes = fsq_quantize(residual / scale, mc.levels)
                toks.append(fsq_codes_to_indices(codes, mc.levels))
                residual = residual - codes * scale
        else:
            zg = z.reshape(B, N, mc.num_groups, mc.fsq_dim)
            for k in range(K):
                codes = fsq_quantize(zg[:, :, k], mc.levels)
                toks.append(fsq_codes_to_indices(codes, mc.levels))
        return jnp.stack(toks, axis=-1)

    def _toks_to_codes(self, params, toks):
        """[B, N, K] → normalized lattice codes [B, N, latent_dim]."""
        mc = self.model_config
        B, N, K = toks.shape
        if mc.residual:
            acc = None
            for k in range(K):
                c = fsq_indices_to_codes(toks[..., k], mc.levels)
                c = c * params["scales"][k]
                acc = c if acc is None else acc + c
            return acc
        parts = []
        for k in range(mc.num_groups):
            if k < K:
                parts.append(fsq_indices_to_codes(toks[..., k], mc.levels))
            else:
                parts.append(jnp.zeros((B, N, mc.fsq_dim)))
        return jnp.concatenate(parts, axis=-1)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    def _toks_to_qfeats(self, params, toks, length):
        codes = self._toks_to_codes(params, toks)
        return conv1d(codes, params["out_proj"]["w"], params["out_proj"]["b"])

    def _toks_to_sig(self, params, toks, length):
        h = self._toks_to_qfeats(params, toks, length)
        return apply_decoder(
            params["decoder"], h, self.model_config.seanet()
        )[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        return apply_decoder(
            params["decoder"], feats, self.model_config.seanet()
        )[:, :, 0]

    def embs(self) -> jax.Array:
        """Materialized implicit lattice codebooks ``[K, C, D]`` (reference
        sweeps indices the same way, ``nanocodec.py:66-81``)."""
        cb = jnp.asarray(fsq_implicit_codebook(self.model_config.levels))
        K = self.config.num_codebooks
        if self.model_config.residual:
            return jnp.stack(
                [cb * self.params["scales"][k] for k in range(K)]
            )
        return jnp.stack([cb] * K)


class NanoCodec(_FSQCodec):
    DEFAULT_ORIG_SR = 22050

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        # 4 parallel FSQ groups of 8^4 = 4096 codes (22.05 kHz).
        return FSQCodecConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            levels=(8, 8, 8, 8),
            num_groups=4,
            residual=False,
            upsampling_ratios=(7, 7, 3, 3),  # hop 441 ≈ 50 Hz at 22.05 kHz
        )


class StableCodec(_FSQCodec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None,
                             bottleneck: tuple[int, int] = (2, 15625)):
        """``bottleneck`` = (num stages, codes/stage): (1, 46656)=6⁶,
        (2, 15625)=5⁶, (4, 729)=3⁶ (reference ``stablecodec.py:32-38``)."""
        stages, codes = bottleneck
        level = round(codes ** (1 / 6))
        if level**6 != codes:
            raise ValueError(f"unsupported bottleneck {bottleneck}")
        return FSQCodecConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            levels=(level,) * 6,
            num_groups=stages,
            residual=True,
            upsampling_ratios=(8, 5, 4, 2),  # 320-sample windows (:96-101)
        )


def init_fsq_codec_params(key, cfg: FSQCodecConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sea = cfg.seanet()
    latent_dim = cfg.fsq_dim if cfg.residual else cfg.num_groups * cfg.fsq_dim
    params = {
        "encoder": init_seanet_params(k1, sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(k2, sea, seanet_decoder_plan(sea)),
        "in_proj": {
            "w": jax.random.normal(k3, (1, cfg.hidden_size, latent_dim))
            * cfg.hidden_size**-0.5,
            "b": jnp.zeros((latent_dim,)),
        },
        "out_proj": {
            "w": jax.random.normal(k4, (1, latent_dim, cfg.hidden_size))
            * latent_dim**-0.5,
            "b": jnp.zeros((cfg.hidden_size,)),
        },
    }
    if cfg.residual:
        params["scales"] = jnp.asarray(
            [0.5**k for k in range(cfg.num_groups)], jnp.float32
        )
    return params
