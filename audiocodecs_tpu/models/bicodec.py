"""BiCodec (Spark-TTS), TPU-native.

Dual-stream single-codebook codec: a **semantic** token stream (frame-rate
VQ over encoder features) plus **32 global/speaker tokens** (learned-query
attention pooling over the utterance, vector-quantized). The public token
grid concatenates them on the N axis — 32 global tokens first, then the
semantic frames — exactly the reference's convention (reference
``audiocodecs/bicodec.py:68-74`` concatenates, ``:95-104`` splits back for
decoding; K = 1 asserted at ``:46``). This layout is what the VC recipe's
global-token swap manipulates (reference ``test_vc.py:88-96``).
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
from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["BiCodec", "BiCodecModelConfig"]

NUM_GLOBAL_TOKENS = 32


@dataclasses.dataclass(frozen=True)
class BiCodecModelConfig:
    sampling_rate: int = 16000
    num_filters: int = 32
    hidden_size: int = 256
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    codebook_size: int = 8192
    codebook_dim: int = 14
    num_global_tokens: int = NUM_GLOBAL_TOKENS

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


class BiCodec(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        return BiCodecModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: int = 1,
        model_config: Optional[BiCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 1:
            raise ValueError("BiCodec is single-codebook (K=1)")
        self.model_config = model_config or BiCodecModelConfig(
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
            params = init_bicodec_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    # ------------------------------------------------------------------ #

    def _encode_feats(self, params, sig):
        return apply_encoder(
            params["encoder"], sig[:, :, None], self.model_config.seanet()
        )

    def _global_tokens(self, params, feats):
        """Learned-query attention pooling → [B, 32] global token ids."""
        mc = self.model_config
        q = params["global_queries"]  # [32, H]
        scores = jnp.einsum("gh,bnh->bgn", q, feats) / jnp.sqrt(
            jnp.asarray(feats.shape[-1], feats.dtype)
        )
        attn = jax.nn.softmax(scores, axis=-1)
        pooled = jnp.einsum("bgn,bnh->bgh", attn, feats)  # [B, 32, H]
        z = jnp.einsum("bgh,hd->bgd", pooled, params["global_proj"])
        return vq_encode(z, params["global_codebook"])  # [B, 32]

    def _sig_to_feats(self, params, sig, length):
        del length
        feats = self._encode_feats(params, sig)
        return jnp.einsum("bnh,hd->bnd", feats, params["sem_proj"])

    def _sig_to_toks(self, params, sig, length):
        feats = self._encode_feats(params, sig)
        glob = self._global_tokens(params, feats)  # [B, 32]
        z = jnp.einsum("bnh,hd->bnd", feats, params["sem_proj"])
        sem = vq_encode(z, params["sem_codebook"])  # [B, N]
        return jnp.concatenate([glob, sem], axis=1)[..., None]  # [B, 32+N, 1]

    def _split(self, toks):
        g = self.model_config.num_global_tokens
        return toks[:, :g, 0], toks[:, g:, 0]

    def _toks_to_qfeats(self, params, toks, length):
        _, sem = self._split(toks)
        return vq_decode(sem, params["sem_codebook"])

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    def _toks_to_sig(self, params, toks, length):
        glob, sem = self._split(toks)
        q = vq_decode(sem, params["sem_codebook"])  # [B, N, D]
        h = jnp.einsum("bnd,dh->bnh", q, params["sem_unproj"])
        # speaker conditioning: mean of global-token codewords, projected
        g = vq_decode(glob, params["global_codebook"]).mean(axis=1)  # [B, D]
        cond = jnp.einsum("bd,dh->bh", g, params["global_unproj"])
        h = h + cond[:, None, :]
        return apply_decoder(
            params["decoder"], h, self.model_config.seanet()
        )[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        h = jnp.einsum("bnd,dh->bnh", feats, params["sem_unproj"])
        return apply_decoder(
            params["decoder"], h, self.model_config.seanet()
        )[:, :, 0]

    def embs(self) -> jax.Array:
        return self.params["sem_codebook"][None]  # [1, C, D]


def init_bicodec_params(key, cfg: BiCodecModelConfig):
    ks = jax.random.split(key, 9)
    sea = cfg.seanet()
    H, D = cfg.hidden_size, cfg.codebook_dim
    return {
        "encoder": init_seanet_params(ks[0], sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(ks[1], sea, seanet_decoder_plan(sea)),
        "sem_proj": jax.random.normal(ks[2], (H, D)) * H**-0.5,
        "sem_unproj": jax.random.normal(ks[3], (D, H)) * D**-0.5,
        "sem_codebook": jax.random.normal(ks[4], (cfg.codebook_size, D)),
        "global_queries": jax.random.normal(ks[5], (cfg.num_global_tokens, H)),
        "global_proj": jax.random.normal(ks[6], (H, D)) * H**-0.5,
        "global_unproj": jax.random.normal(ks[7], (D, H)) * D**-0.5,
        "global_codebook": jax.random.normal(ks[8], (cfg.codebook_size, D)),
    }
