"""Stable Codec, TPU-native (TAAE transformer autoencoder).

``stabilityai/stable-codec-speech-16k`` (paper arXiv:2411.19842; reference
wrapper ``audiocodecs/stablecodec.py:30-181``) is a fully transformer-based
codec: waveform patchify → rotary-attention transformer encoder with one
2× downsampling stage (16 kHz → 50 Hz → 25 Hz) → 6-d latent → FSQ →
mirrored transformer decoder → unpatchify. At inference the reference swaps
the training bottleneck for a **post-hoc residual FSQ** ladder
(``set_posthoc_bottleneck``, ``stablecodec.py:68``) with three published
grids: 1×46656 (6⁶), 2×15625 (5⁶), 4×729 (3⁶), each residual stage scaled
by a fixed constant (code constants in the vendor repo, not checkpoint
weights — kept in :class:`StableCodecModelConfig` for validation against
the vendor source on the first networked run).

Reference surface: input padded to 320-sample windows (``:96-101``);
``embs()`` sweeps ``indices_to_codes`` per stage (``:76-89``) → the scaled
FSQ lattice; ``_sig_to_feats`` returns the continuous pre-bottleneck 6-d
latents (``:109-115``).

TPU notes: patchify turns 16 kHz audio into 50 Hz × 1024-d sequences
immediately, so *all* compute is dense attention/matmul on the MXU — there
is no long-sequence conv stack at all; FSQ is elementwise VPU rounding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import conv1d, conv_transpose1d
from audiocodecs_tpu.nn.roformer import (
    RoformerConfig,
    apply_roformer,
    init_roformer_params,
)
from audiocodecs_tpu.quant.fsq import (
    fsq_codes_to_indices,
    fsq_implicit_codebook,
    fsq_indices_to_codes,
    fsq_quantize,
)

__all__ = ["StableCodec", "StableCodecModelConfig"]

# (levels per stage, per-stage residual scales) for the published post-hoc
# bottlenecks (vendor: stable_codec ResidualFSQBottleneck configs).
_BOTTLENECKS = {
    (1, 46656): ((6,) * 6, (1.0,)),
    (2, 15625): ((5,) * 6, (1.0, 0.25)),
    (4, 729): ((3,) * 6, (1.0, 0.5, 0.25, 0.125)),
}


@dataclasses.dataclass(frozen=True)
class StableCodecModelConfig:
    sampling_rate: int = 16000
    patch: int = 320  # patchify hop → 50 Hz pre-pool rate
    dim: int = 1024
    depth_outer: int = 8  # blocks at 50 Hz (encoder) / after upsample (dec)
    depth_inner: int = 8  # blocks at 25 Hz (around the bottleneck)
    num_heads: int = 16
    latent_dim: int = 6
    levels: tuple[int, ...] = (5,) * 6
    scales: tuple[float, ...] = (1.0, 0.25)

    @property
    def hop_length(self) -> int:
        return self.patch * 2

    @property
    def vocab_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out

    def roformer(self, depth: int) -> RoformerConfig:
        # stable-audio-tools transformer conventions: gateless attention,
        # SwiGLU feed-forward, rotary embeddings
        head_dim = self.dim // self.num_heads
        return RoformerConfig(dim=self.dim, depth=depth,
                              num_heads=self.num_heads,
                              rope_dim=min(64, head_dim),
                              use_gates=False, ffn="swiglu")


class StableCodec(Codec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None,
                             bottleneck: tuple[int, int] = (2, 15625)):
        """``bottleneck`` = (num stages, codes/stage), one of (1, 46656),
        (2, 15625), (4, 729) (reference ``stablecodec.py:32-38``)."""
        if bottleneck not in _BOTTLENECKS:
            raise ValueError(f"unsupported bottleneck {bottleneck}; "
                             f"choose from {sorted(_BOTTLENECKS)}")
        levels, scales = _BOTTLENECKS[bottleneck]
        return StableCodecModelConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            levels=levels, scales=scales,
        )

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: Optional[int] = None,
        model_config: Optional[StableCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        orig_sample_rate = orig_sample_rate or self.DEFAULT_ORIG_SR
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate
        )
        mc = self.model_config
        num_codebooks = num_codebooks or len(mc.scales)
        if num_codebooks > len(mc.scales):
            raise ValueError(
                f"num_codebooks {num_codebooks} > bottleneck stages "
                f"{len(mc.scales)}"
            )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=mc.vocab_size,
        )
        if params is None:
            params = init_stablecodec_params(
                key if key is not None else jax.random.PRNGKey(0), mc
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if not k.startswith("dec") and k != "unpatch"
                      and k != "from_latent"}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if not k.startswith("enc") and k != "patch"
                      and k != "to_latent"}
        super().__init__(cfg, params)

    # ----------------------------- encode ----------------------------- #

    def _latents(self, params, sig):
        """[B, T] → continuous pre-bottleneck latents [B, N, latent_dim]."""
        mc = self.model_config
        T = sig.shape[-1]
        pad = (-T) % mc.hop_length  # reference pads to window multiples
        if pad:
            sig = jnp.pad(sig, ((0, 0), (0, pad)))
        x = conv1d(sig[:, :, None], params["patch"]["w"],
                   params["patch"]["b"], stride=mc.patch)  # [B, T/p, dim]
        x = apply_roformer(params["enc_outer"], x, mc.roformer(mc.depth_outer))
        B, N, C = x.shape
        x = x.reshape(B, N // 2, 2 * C)
        x = jnp.einsum("bnc,cd->bnd", x, params["enc_down"]["w"]) + (
            params["enc_down"]["b"])  # 2× pool → 25 Hz
        x = apply_roformer(params["enc_inner"], x, mc.roformer(mc.depth_inner))
        x = _ln(x, params["enc_norm"])
        return jnp.einsum("bnc,cd->bnd", x, params["to_latent"]["w"]) + (
            params["to_latent"]["b"])

    def _sig_to_feats(self, params, sig, length):
        del length
        return self._latents(params, sig)

    def _residual_encode(self, z, K):
        mc = self.model_config
        toks = []
        residual = z
        for k in range(K):
            s = mc.scales[k]
            codes = fsq_quantize(residual / s, mc.levels)
            toks.append(fsq_codes_to_indices(codes, mc.levels))
            residual = residual - codes * s
        return jnp.stack(toks, axis=-1)

    def _sig_to_toks(self, params, sig, length):
        del length
        return self._residual_encode(
            self._latents(params, sig), self.config.num_codebooks
        )

    def _toks_to_qfeats(self, params, toks, length):
        mc = self.model_config
        acc = None
        for k in range(toks.shape[-1]):
            c = fsq_indices_to_codes(toks[..., k], mc.levels) * mc.scales[k]
            acc = c if acc is None else acc + c
        return acc

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    # ----------------------------- decode ----------------------------- #

    def _decode(self, params, z):
        from audiocodecs_tpu.nn.layers import conv_role

        mc = self.model_config
        with conv_role("decoder"):
            x = jnp.einsum("bnd,dc->bnc", z, params["from_latent"]["w"]) + (
                params["from_latent"]["b"])
            x = apply_roformer(params["dec_inner"], x,
                               mc.roformer(mc.depth_inner))
            B, N, C = x.shape
            x = jnp.einsum("bnc,cd->bnd", x, params["dec_up"]["w"]) + (
                params["dec_up"]["b"])  # [B, N, 2·dim]
            x = x.reshape(B, N * 2, C)
            x = apply_roformer(params["dec_outer"], x,
                               mc.roformer(mc.depth_outer))
            x = _ln(x, params["dec_norm"])
            y = conv_transpose1d(x, params["unpatch"]["w"],
                                 params["unpatch"]["b"], stride=mc.patch)
        return y[:, :, 0]

    def _toks_to_sig(self, params, toks, length):
        return self._decode(params, self._toks_to_qfeats(params, toks,
                                                         length))

    def _feats_to_sig(self, params, feats, length):
        return self._decode(params, feats)

    def embs(self) -> jax.Array:
        """Scaled FSQ lattices ``[K, C, latent_dim]`` (reference sweeps
        ``indices_to_codes`` per stage, ``stablecodec.py:76-89``)."""
        mc = self.model_config
        cb = jnp.asarray(fsq_implicit_codebook(mc.levels))
        return jnp.stack(
            [cb * mc.scales[k] for k in range(self.config.num_codebooks)]
        )


def _ln(x, p, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def init_stablecodec_params(key, cfg: StableCodecModelConfig):
    ks = jax.random.split(key, 12)
    C, D = cfg.dim, cfg.latent_dim

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    def norm():
        return {"g": jnp.ones((C,)), "b": jnp.zeros((C,))}

    return {
        "patch": {"w": jax.random.normal(ks[0], (cfg.patch, 1, C))
                  * cfg.patch**-0.5, "b": jnp.zeros((C,))},
        "enc_outer": init_roformer_params(ks[1],
                                          cfg.roformer(cfg.depth_outer)),
        "enc_down": lin(ks[2], 2 * C, C),
        "enc_inner": init_roformer_params(ks[3],
                                          cfg.roformer(cfg.depth_inner)),
        "enc_norm": norm(),
        "to_latent": lin(ks[4], C, D),
        "from_latent": lin(ks[5], D, C),
        "dec_inner": init_roformer_params(ks[6],
                                          cfg.roformer(cfg.depth_inner)),
        "dec_up": lin(ks[7], C, 2 * C),
        "dec_outer": init_roformer_params(ks[8],
                                          cfg.roformer(cfg.depth_outer)),
        "dec_norm": norm(),
        "unpatch": {"w": jax.random.normal(ks[9], (cfg.patch, C, 1))
                    * C**-0.5, "b": jnp.zeros((1,))},
    }
