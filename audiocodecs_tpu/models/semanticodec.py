"""SemantiCodec, TPU-native.

The largest-surface family in the reference zoo (reference
``audiocodecs/semanticodec.py:30-380``): mel spectrogram → AudioMAE-style
ViT encoder (windowed over 1024-frame mels, ``:273-285``) → **2 codebooks**
(semantic k-means with 4096–32768 centroids + acoustic residual VQ 8192,
``:34-35,65-66``) → **latent-diffusion DDIM decoder** with classifier-free
guidance over token windows with overlap-add (``:224-261``), input padded to
fixed-length segments (``:154-163``).

TPU re-design:
  * ViT = the shared transformer blocks over mel patches (learned pos emb);
  * DDIM sampling = one ``lax.scan`` over a static step schedule with CFG —
    the whole sampler is a single jitted program;
  * long audio = host-side windowing into fixed segments (static shapes per
    window) with overlap-add, same scheme as the reference;
  * vocoding from decoded latent features via a Vocos ISTFT head.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.downstream.metrics.dsp import mel_filterbank, stft_mag
from audiocodecs_tpu.nn.transformer import (
    TransformerConfig,
    apply_transformer,
    init_transformer_params,
)
from audiocodecs_tpu.nn.vocos import VocosConfig, apply_vocos, init_vocos_params
from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["SemantiCodec", "SemantiCodecModelConfig"]


@dataclasses.dataclass(frozen=True)
class SemantiCodecModelConfig:
    sampling_rate: int = 16000
    n_mels: int = 64
    n_fft: int = 1024
    hop: int = 160  # 100 mel frames / s
    patch_frames: int = 4  # mel frames per token  → 25 Hz token rate
    semantic_vocab: int = 8192  # reference supports 4096..32768 (:34)
    acoustic_vocab: int = 8192
    hidden_size: int = 192
    encoder_layers: int = 4
    denoiser_layers: int = 4
    num_heads: int = 4
    ddim_steps: int = 8
    cfg_scale: float = 2.0
    segment_frames: int = 256  # fixed mel window per segment

    def encoder_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden_size,
            num_layers=self.encoder_layers,
            num_heads=self.num_heads,
            num_kv_heads=self.num_heads,
            head_dim=self.hidden_size // self.num_heads,
            intermediate_size=self.hidden_size * 4,
            act="gelu", norm="layernorm", causal=False,
        )

    def denoiser_cfg(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden_size,
            num_layers=self.denoiser_layers,
            num_heads=self.num_heads,
            num_kv_heads=self.num_heads,
            head_dim=self.hidden_size // self.num_heads,
            intermediate_size=self.hidden_size * 4,
            act="gelu", norm="layernorm", causal=False,
        )

    def vocos(self) -> VocosConfig:
        return VocosConfig(
            input_channels=self.n_mels,
            dim=self.hidden_size,
            intermediate_dim=self.hidden_size * 3,
            num_layers=4,
            n_fft=self.n_fft,
            hop_length=self.hop,
            num_adanorm_embeddings=None,
        )


def _mel(sig, cfg: SemantiCodecModelConfig):
    fb = jnp.asarray(mel_filterbank(cfg.sampling_rate, cfg.n_fft, cfg.n_mels))
    m = stft_mag(sig, cfg.n_fft, cfg.hop) @ fb
    return jnp.log(jnp.maximum(m, 1e-5))


class SemantiCodec(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        return SemantiCodecModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: int = 2,
        model_config: Optional[SemantiCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 2:
            raise ValueError("SemantiCodec has 2 codebooks (semantic+acoustic)")
        self.model_config = model_config or SemantiCodecModelConfig(
            sampling_rate=orig_sample_rate
        )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=2,
            vocab_size=max(self.model_config.semantic_vocab,
                           self.model_config.acoustic_vocab),
            vocab_sizes=(self.model_config.semantic_vocab,
                         self.model_config.acoustic_vocab),
        )
        if params is None:
            params = init_semanticodec_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if k not in ("denoiser", "time_emb", "cond_proj",
                                   "latent_out", "vocos")}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("encoder", "patch_proj")}
        super().__init__(cfg, params)

    # -------------------------- encode ------------------------------- #

    def _encode_latents(self, params, sig):
        """[B, T] → ViT features at token rate [B, N, H]."""
        mc = self.model_config
        mel = _mel(sig, mc)  # [B, F, n_mels]
        B, F, M = mel.shape
        P = mc.patch_frames
        F_pad = (F + P - 1) // P * P
        mel = jnp.pad(mel, ((0, 0), (0, F_pad - F), (0, 0)))
        patches = mel.reshape(B, F_pad // P, P * M)
        x = jnp.einsum("bnp,ph->bnh", patches, params["patch_proj"]["w"]) + (
            params["patch_proj"]["b"]
        )
        N = x.shape[1]
        x = x + params["pos_emb"][:N][None]
        return apply_transformer(params["encoder"], x, mc.encoder_cfg())

    def _sig_to_feats(self, params, sig, length):
        del length
        return self._encode_latents(params, sig)

    def _sig_to_toks(self, params, sig, length):
        feats = self._encode_latents(params, sig)
        sem = vq_encode(feats, params["semantic_codebook"])
        res = feats - vq_decode(sem, params["semantic_codebook"])
        ac = vq_encode(res, params["acoustic_codebook"])
        return jnp.stack([sem, ac], axis=-1)

    def _toks_to_qfeats(self, params, toks, length):
        q = vq_decode(toks[..., 0], params["semantic_codebook"])
        return q + vq_decode(toks[..., 1], params["acoustic_codebook"])

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    # -------------------------- DDIM decode --------------------------- #

    def _denoise(self, params, x_t, t_emb, cond):
        mc = self.model_config
        h = x_t + t_emb[:, None, :] + cond
        return apply_transformer(params["denoiser"], h, mc.denoiser_cfg())

    def _ddim_sample(self, params, cond, key):
        """Conditional DDIM with classifier-free guidance → latents."""
        mc = self.model_config
        B, N, H = cond.shape
        steps = mc.ddim_steps
        # cosine-ish alpha schedule over the sampled steps (static)
        ts = np.linspace(1.0, 0.0, steps + 1)
        alphas = jnp.asarray(np.cos(ts * np.pi / 2) ** 2,
                             jnp.float32)  # ᾱ: t=1 (noise) → t=0
        x = jax.random.normal(key, (B, N, H))
        uncond = jnp.zeros_like(cond)

        def step(x, i):
            a_t = alphas[i]
            a_next = alphas[i + 1]
            t_val = jnp.full((B,), 1.0 - i / steps, jnp.float32)
            t_emb = jnp.einsum("b,h->bh", t_val, params["time_emb"])
            c = jnp.einsum("bnh,hd->bnd", cond, params["cond_proj"])
            eps_c = self._denoise(params, x, t_emb, c)
            eps_u = self._denoise(params, x, t_emb, uncond)
            eps = eps_u + mc.cfg_scale * (eps_c - eps_u)
            x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(jnp.maximum(a_t, 1e-8))
            x_next = jnp.sqrt(a_next) * x0 + jnp.sqrt(1 - a_next) * eps
            return x_next, None

        x, _ = jax.lax.scan(step, x, jnp.arange(steps))
        return jnp.einsum("bnh,hm->bnm", x, params["latent_out"]["w"]) + (
            params["latent_out"]["b"]
        )

    def _toks_to_sig(self, params, toks, length):
        mc = self.model_config
        cond = self._toks_to_qfeats(params, toks, length)
        mel_feat = self._ddim_sample(
            params, cond, jax.random.PRNGKey(0)
        )  # [B, N, n_mels] at token rate
        # upsample token-rate mel features back to mel frame rate
        mel_frames = jnp.repeat(mel_feat, mc.patch_frames, axis=1)
        return apply_vocos(params["vocos"], mel_frames, mc.vocos())

    def _feats_to_sig(self, params, feats, length):
        mc = self.model_config
        mel_feat = self._ddim_sample(params, feats, jax.random.PRNGKey(0))
        mel_frames = jnp.repeat(mel_feat, mc.patch_frames, axis=1)
        return apply_vocos(params["vocos"], mel_frames, mc.vocos())

    def embs(self) -> jax.Array:
        """[2, C, H] with per-codebook padding to the larger vocab."""
        mc = self.model_config
        C = self.config.vocab_size
        out = []
        for cb in (self.params["semantic_codebook"],
                   self.params["acoustic_codebook"]):
            pad = C - cb.shape[0]
            out.append(jnp.pad(cb, ((0, pad), (0, 0))) if pad else cb)
        return jnp.stack(out)


def init_semanticodec_params(key, cfg: SemantiCodecModelConfig):
    ks = jax.random.split(key, 10)
    H, M, P = cfg.hidden_size, cfg.n_mels, cfg.patch_frames
    max_tokens = 4096
    return {
        "patch_proj": {
            "w": jax.random.normal(ks[0], (P * M, H)) * (P * M) ** -0.5,
            "b": jnp.zeros((H,)),
        },
        "pos_emb": jax.random.normal(ks[1], (max_tokens, H)) * 0.02,
        "encoder": init_transformer_params(ks[2], cfg.encoder_cfg()),
        "semantic_codebook": jax.random.normal(ks[3], (cfg.semantic_vocab, H)),
        "acoustic_codebook": jax.random.normal(ks[4], (cfg.acoustic_vocab, H)),
        "denoiser": init_transformer_params(ks[5], cfg.denoiser_cfg()),
        "time_emb": jax.random.normal(ks[6], (H,)),
        "cond_proj": jax.random.normal(ks[7], (H, H)) * H**-0.5,
        "latent_out": {
            "w": jax.random.normal(ks[8], (H, M)) * H**-0.5,
            "b": jnp.zeros((M,)),
        },
        "vocos": init_vocos_params(ks[9], cfg.vocos()),
    }
