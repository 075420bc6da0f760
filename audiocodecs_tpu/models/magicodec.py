"""MagiCodec, TPU-native (transformer codec, one 131072-entry VQ).

``MagiCodec-50Hz-Base`` (paper arXiv:2506.00385; reference wrapper
``audiocodecs/magicodec.py:30-146``: ``Generator`` with ``encoder`` /
``quantizer.codebook.weight`` / ``decoder``, K = 1 asserted, vocab
131072) is a *transformer* codec: conv patchify (hop 320 → 50 Hz at
16 kHz) → RoPE transformer encoder → factorized nearest-neighbor VQ in a
projected low-dim space (one ``[B·N, D] @ [D, 131072]`` MXU matmul even at
131k entries) → RoPE transformer decoder → transposed-conv unpatchify.

CONFIDENCE NOTE: tower depth/width and module naming follow the paper's
description + BS-RoFormer conventions; diff a real checkpoint with
``tools/inspect_checkpoint.py --family magicodec`` before converting.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import conv1d, conv_transpose1d, pad1d
from audiocodecs_tpu.nn.roformer import (
    RoformerConfig,
    apply_roformer,
    init_roformer_params,
)
from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["MagiCodec", "MagiCodecModelConfig"]


@dataclasses.dataclass(frozen=True)
class MagiCodecModelConfig:
    sampling_rate: int = 16000
    hop_length: int = 320  # 50 Hz tokens
    dim: int = 1024
    depth: int = 8  # transformer blocks per side
    num_heads: int = 16
    codebook_size: int = 131072
    codebook_dim: int = 16
    l2_normalized: bool = True

    def roformer(self) -> RoformerConfig:
        head_dim = self.dim // self.num_heads
        return RoformerConfig(dim=self.dim, depth=self.depth,
                              num_heads=self.num_heads,
                              rope_dim=min(64, head_dim))


class MagiCodec(Codec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return MagiCodecModelConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: int = 1,
        latent: bool = False,
        model_config: Optional[MagiCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 1:
            raise ValueError("MagiCodec is single-codebook (K=1)")
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
            params = init_magicodec_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if k not in ("dec", "dec_norm", "unpatch", "out_proj")}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("enc", "enc_norm", "patch", "in_proj")}
        super().__init__(cfg, params)

    # ----------------------------- encode ----------------------------- #

    def _latents(self, params, sig):
        mc = self.model_config
        k = 2 * mc.hop_length
        pad = (k - mc.hop_length) // 2
        x = conv1d(pad1d(sig[:, :, None], pad, pad, mode="constant"),
                   params["patch"]["w"], params["patch"]["b"],
                   stride=mc.hop_length)  # [B, T/hop, dim]
        x = apply_roformer(params["enc"], x, mc.roformer())
        x = _ln(x, params["enc_norm"])
        return jnp.einsum("bnc,cd->bnd", x, params["in_proj"]["w"]) + (
            params["in_proj"]["b"])

    def _sig_to_feats(self, params, sig, length):
        del length
        return self._latents(params, sig)

    def _sig_to_toks(self, params, sig, length):
        z = self._latents(params, sig)
        cb = params["codebook"]
        if self.model_config.l2_normalized:
            from audiocodecs_tpu.nn.layers import unit_norm

            idx = vq_encode(unit_norm(z), unit_norm(cb))
        else:
            idx = vq_encode(z, cb)
        return idx[..., None]

    def _dequantize(self, params, idx):
        v = vq_decode(idx, params["codebook"])
        return jnp.einsum("bnd,dc->bnc", v, params["out_proj"]["w"]) + (
            params["out_proj"]["b"])

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._dequantize(params, toks[..., 0])

    def _toks_to_qfeats(self, params, toks, length):
        return self._dequantize(params, toks[..., 0])

    # ----------------------------- decode ----------------------------- #

    def _decode(self, params, h):
        from audiocodecs_tpu.nn.layers import conv_role

        mc = self.model_config
        with conv_role("decoder"):
            x = apply_roformer(params["dec"], h, mc.roformer())
            x = _ln(x, params["dec_norm"])
            k = 2 * mc.hop_length
            y = conv_transpose1d(x, params["unpatch"]["w"],
                                 params["unpatch"]["b"],
                                 stride=mc.hop_length)
        pad = (k - mc.hop_length) // 2
        return y[:, pad : y.shape[1] - pad, 0]

    def _toks_to_sig(self, params, toks, length):
        return self._decode(params, self._dequantize(params, toks[..., 0]))

    def _feats_to_sig(self, params, feats, length):
        return self._decode(params, feats)

    def embs(self) -> jax.Array:
        """Codebook rows (reference reads ``quantizer.codebook.weight``,
        ``magicodec.py:62-65``); ``latent`` flips to the raw low-dim rows."""
        cb = self.params["codebook"]
        if self.latent:
            return cb[None]
        v = jnp.einsum("cd,dh->ch", cb, self.params["out_proj"]["w"]) + (
            self.params["out_proj"]["b"])
        return v[None]


def _ln(x, p, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def init_magicodec_params(key, cfg: MagiCodecModelConfig):
    ks = jax.random.split(key, 8)
    C, D = cfg.dim, cfg.codebook_dim
    k = 2 * cfg.hop_length

    def lin(kk, i, o):
        return {"w": jax.random.normal(kk, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    return {
        "patch": {"w": jax.random.normal(ks[0], (k, 1, C)) * k**-0.5,
                  "b": jnp.zeros((C,))},
        "enc": init_roformer_params(ks[1], cfg.roformer()),
        "enc_norm": {"g": jnp.ones((C,)), "b": jnp.zeros((C,))},
        "in_proj": lin(ks[2], C, D),
        "codebook": jax.random.normal(ks[3], (cfg.codebook_size, D)),
        "out_proj": lin(ks[4], D, C),
        "dec": init_roformer_params(ks[5], cfg.roformer()),
        "dec_norm": {"g": jnp.ones((C,)), "b": jnp.zeros((C,))},
        "unpatch": {"w": jax.random.normal(ks[6], (k, C, 1)) * C**-0.5,
                    "b": jnp.zeros((1,))},
    }
