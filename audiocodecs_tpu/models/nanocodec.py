"""NanoCodec (NVIDIA NeMo), TPU-native (HiFiGAN-AE + grouped FSQ).

``nvidia/nemo-nano-codec-22khz-*`` (paper arXiv:2508.05835; reference
wrapper ``audiocodecs/nanocodec.py:29-119``) is a NeMo ``AudioCodecModel``:

  * ``audio_encoder`` — HiFiGAN-inverted encoder: weight-norm pre-conv →
    per-stage [HiFiGAN res layer (average of ``len(resblock_kernels)``
    parallel blocks, each a sequence of dilated input/skip conv pairs) →
    half-snake activation → strided down-sample conv doubling channels] →
    half-snake → post-conv to ``encoded_dim``;
  * ``vector_quantizer`` — ``GroupFiniteScalarQuantizer``: the latent is
    split into ``num_groups`` equal slices, each rounded on its own FSQ
    lattice (parameter-free; reference sweeps per-group indices for
    ``embs()`` at ``nanocodec.py:66-81``);
  * ``audio_decoder`` — the mirror HiFiGAN decoder (transposed up-sample
    convs halving channels, res layers, tanh output).

Causal convolutions (left-only padding) keep the codec streamable like the
released models. Down-sample rates default to hop 1764 → 12.5 fps at
22.05 kHz (the 0.6 kbps release: 4 groups × 12 bits × 12.5 Hz).

CONFIDENCE NOTE: module/key naming follows NeMo's public
``audio_codec_modules.py`` conventions; exact stage widths/rates of each
release need a real-checkpoint diff (``tools/inspect_checkpoint.py
--family nanocodec``) — unmapped keys raise at conversion.

TPU notes: every conv is a dense MXU op; the res-layer average is a fused
elementwise combine; FSQ rounding is pure VPU with no codebook search.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import conv1d, conv_transpose1d
from audiocodecs_tpu.quant.fsq import (
    fsq_codes_to_indices,
    fsq_implicit_codebook,
    fsq_indices_to_codes,
    fsq_quantize,
)

__all__ = ["NanoCodec", "NanoCodecModelConfig"]


@dataclasses.dataclass(frozen=True)
class NanoCodecModelConfig:
    sampling_rate: int = 22050
    base_channels: int = 16
    down_sample_rates: tuple[int, ...] = (2, 2, 3, 3, 7, 7)  # hop 1764
    in_kernel_size: int = 7
    out_kernel_size: int = 7
    resblock_kernels: tuple[int, ...] = (3, 7, 11)
    resblock_dilations: tuple[int, ...] = (1, 3, 5)
    levels: tuple[int, ...] = (8, 8, 8, 8)  # per-group lattice (4096)
    num_groups: int = 4
    causal: bool = True

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.down_sample_rates:
            out *= r
        return out

    @property
    def fsq_dim(self) -> int:
        return len(self.levels)

    @property
    def encoded_dim(self) -> int:
        return self.num_groups * self.fsq_dim

    @property
    def final_channels(self) -> int:
        return self.base_channels * (2 ** len(self.down_sample_rates))

    @property
    def vocab_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out


def _pad(x, k: int, dilation: int, causal: bool):
    span = (k - 1) * dilation
    if causal:
        return jnp.pad(x, ((0, 0), (span, 0), (0, 0)))
    left = span // 2
    return jnp.pad(x, ((0, 0), (left, span - left), (0, 0)))


def _conv(x, p, cfg, stride: int = 1, dilation: int = 1):
    # full (k-1)·d pad then VALID: out = ceil(T/stride)
    x = _pad(x, p["w"].shape[0], dilation, cfg.causal)
    return conv1d(x, p["w"], p["b"], stride=stride, dilation=dilation)


def _half_snake(x, alpha):
    """NeMo HalfSnake: snake on the first half channels, leaky-relu (0.1)
    on the rest."""
    half = alpha.shape[-1]
    a, b = x[..., :half], x[..., half:]
    a = a + jnp.sin(alpha * a) ** 2 / jnp.maximum(alpha, 1e-9)
    return jnp.concatenate([a, jax.nn.leaky_relu(b, 0.1)], axis=-1)


def _res_layer(x, p, kernels, dilations, cfg):
    """Average of parallel HiFiGAN res blocks (one per kernel size), each a
    sequence of dilated (input conv → skip conv) residual pairs."""
    acc = None
    for bi, _k in enumerate(kernels):
        h = x
        blk = p["blocks"][bi]
        for di, dil in enumerate(dilations):
            u = blk["units"][di]
            s = _half_snake(h, u["alpha1"])
            s = _conv(s, u["input_conv"], cfg, dilation=dil)
            s = _half_snake(s, u["alpha2"])
            s = _conv(s, u["skip_conv"], cfg)
            h = h + s
        acc = h if acc is None else acc + h
    return acc / len(kernels)


class NanoCodec(Codec):
    DEFAULT_ORIG_SR = 22050

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return NanoCodecModelConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: Optional[int] = None,
        model_config: Optional[NanoCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        orig_sample_rate = orig_sample_rate or self.DEFAULT_ORIG_SR
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate
        )
        mc = self.model_config
        num_codebooks = num_codebooks or mc.num_groups
        if num_codebooks > mc.num_groups:
            raise ValueError(
                f"num_codebooks {num_codebooks} > groups {mc.num_groups}")
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=mc.vocab_size,
        )
        if params is None:
            params = init_nanocodec_params(
                key if key is not None else jax.random.PRNGKey(0), mc)
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    # ----------------------------- encode ----------------------------- #

    def _latents(self, params, sig):
        mc = self.model_config
        p = params["encoder"]
        x = _conv(sig[:, :, None], p["pre_conv"], mc)
        for si, rate in enumerate(mc.down_sample_rates):
            st = p["stages"][si]
            x = _res_layer(x, st["res"], mc.resblock_kernels,
                           mc.resblock_dilations, mc)
            x = _half_snake(x, st["alpha"])
            x = _conv(x, st["down"], mc, stride=rate)
        x = _half_snake(x, p["post_alpha"])
        return _conv(x, p["post_conv"], mc)  # [B, N, encoded_dim]

    def _sig_to_feats(self, params, sig, length):
        del length
        return self._latents(params, sig)

    def _sig_to_toks(self, params, sig, length):
        mc = self.model_config
        z = self._latents(params, sig)
        B, N, _ = z.shape
        zg = z.reshape(B, N, mc.num_groups, mc.fsq_dim)
        toks = []
        for k in range(self.config.num_codebooks):
            codes = fsq_quantize(zg[:, :, k], mc.levels)
            toks.append(fsq_codes_to_indices(codes, mc.levels))
        return jnp.stack(toks, axis=-1)

    def _toks_to_codes(self, params, toks):
        mc = self.model_config
        B, N, K = toks.shape
        parts = []
        for k in range(mc.num_groups):
            if k < K:
                parts.append(fsq_indices_to_codes(toks[..., k], mc.levels))
            else:
                parts.append(jnp.zeros((B, N, mc.fsq_dim)))
        return jnp.concatenate(parts, axis=-1)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_codes(params, toks)

    def _toks_to_qfeats(self, params, toks, length):
        return self._toks_to_codes(params, toks)

    # ----------------------------- decode ----------------------------- #

    def _decode(self, params, z):
        mc = self.model_config
        p = params["decoder"]
        x = _conv(z, p["pre_conv"], mc)  # → final_channels
        for si, rate in enumerate(reversed(mc.down_sample_rates)):
            st = p["stages"][si]
            x = _half_snake(x, st["alpha"])
            y = conv_transpose1d(x, st["up"]["w"], st["up"]["b"],
                                 stride=rate)
            # trim transposed-conv overhang (causal: trim right)
            extra = y.shape[1] - x.shape[1] * rate
            if extra > 0:
                if mc.causal:
                    y = y[:, :-extra]
                else:
                    left = extra // 2
                    y = y[:, left : y.shape[1] - (extra - left)]
            x = _res_layer(y, st["res"], mc.resblock_kernels,
                           mc.resblock_dilations, mc)
        x = _half_snake(x, p["post_alpha"])
        x = _conv(x, p["post_conv"], mc)
        return jnp.tanh(x)[:, :, 0]

    def _toks_to_sig(self, params, toks, length):
        return self._decode(params, self._toks_to_codes(params, toks))

    def _feats_to_sig(self, params, feats, length):
        return self._decode(params, feats)

    def embs(self) -> jax.Array:
        """Implicit per-group lattices ``[K, C, fsq_dim]`` (reference sweeps
        indices per FSQ, ``nanocodec.py:66-81``)."""
        cb = jnp.asarray(fsq_implicit_codebook(self.model_config.levels))
        return jnp.stack([cb] * self.config.num_codebooks)


def init_nanocodec_params(key, cfg: NanoCodecModelConfig):
    def conv(k, kernel, cin, cout):
        return {"w": jax.random.normal(k, (kernel, cin, cout))
                * (kernel * cin) ** -0.5, "b": jnp.zeros((cout,))}

    def res_layer(k, ch):
        blocks = []
        for bi, kernel in enumerate(cfg.resblock_kernels):
            units = []
            for di in range(len(cfg.resblock_dilations)):
                kk = jax.random.split(jax.random.fold_in(k, bi * 16 + di), 2)
                units.append({
                    "alpha1": jnp.ones((ch // 2,)),
                    "input_conv": conv(kk[0], kernel, ch, ch),
                    "alpha2": jnp.ones((ch // 2,)),
                    "skip_conv": conv(kk[1], kernel, ch, ch),
                })
            blocks.append({"units": units})
        return {"blocks": blocks}

    ke, kd = jax.random.split(key)
    ch = cfg.base_channels
    enc_stages = []
    for si, rate in enumerate(cfg.down_sample_rates):
        kk = jax.random.split(jax.random.fold_in(ke, si), 2)
        enc_stages.append({
            "res": res_layer(kk[0], ch),
            "alpha": jnp.ones((ch // 2,)),
            "down": conv(kk[1], 2 * rate, ch, 2 * ch),
        })
        ch *= 2
    encoder = {
        "pre_conv": conv(jax.random.fold_in(ke, 100), cfg.in_kernel_size,
                         1, cfg.base_channels),
        "stages": enc_stages,
        "post_alpha": jnp.ones((ch // 2,)),
        "post_conv": conv(jax.random.fold_in(ke, 101), cfg.out_kernel_size,
                          ch, cfg.encoded_dim),
    }

    dec_stages = []
    ch = cfg.final_channels
    for si, rate in enumerate(reversed(cfg.down_sample_rates)):
        kk = jax.random.split(jax.random.fold_in(kd, si), 2)
        dec_stages.append({
            "alpha": jnp.ones((ch // 2,)),
            "up": conv(kk[0], 2 * rate, ch, ch // 2),
            "res": res_layer(kk[1], ch // 2),
        })
        ch //= 2
    decoder = {
        "pre_conv": conv(jax.random.fold_in(kd, 100), cfg.in_kernel_size,
                         cfg.encoded_dim, cfg.final_channels),
        "stages": dec_stages,
        "post_alpha": jnp.ones((ch // 2,)),
        "post_conv": conv(jax.random.fold_in(kd, 101), cfg.out_kernel_size,
                          ch, 1),
    }
    return {"encoder": encoder, "decoder": decoder}
