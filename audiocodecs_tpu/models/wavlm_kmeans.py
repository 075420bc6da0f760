"""WavLM + K-means discrete codec, TPU-native.

Replaces the reference's wrapper around ``lucadellalib/discrete-wavlm-codec``
(reference ``audiocodecs/wavlm_kmeans.py:30-137``): WavLM hidden states from
selected layers (``layer_ids`` ∈ {(6,), (1, 3, 6)}, ``:28-30``) are
k-means-quantized (512 centroids per layer → K = len(layer_ids) codebooks);
decoding runs a dequantizer + vocoder (``:85-101``).

Here the SSL encoder is the first-party JAX WavLM
(:mod:`audiocodecs_tpu.nn.wavlm`, HF-weight-compatible), k-means encode is
the standard euclidean VQ matmul, and the vocoder is a SEANet decoder from
dequantized features to 16 kHz audio.
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
    init_seanet_params,
    seanet_decoder_plan,
)
from audiocodecs_tpu.nn.wavlm import (
    WavLMConfig,
    apply_wavlm,
    wavlm_large_config,
)
from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["WavLMKmeans", "WavLMKmeansModelConfig"]


@dataclasses.dataclass(frozen=True)
class WavLMKmeansModelConfig:
    sampling_rate: int = 16000
    layer_ids: tuple[int, ...] = (6,)
    num_clusters: int = 512
    # the reference's hub model is discrete_wavlm_LARGE
    # (wavlm_kmeans.py:42-46): pre-norm encoder, layer-norm feat extractor
    wavlm: WavLMConfig = dataclasses.field(default_factory=wavlm_large_config)
    # vocoder: "seanet" (default analog, SEANet decoder) or "hifigan" —
    # the vendor hub model's unit-vocoder lineage (jik876/speechbrain
    # HiFi-GAN generator over dequantized 50 Hz SSL features, hop 320);
    # converts via ``convert.ldm.convert_hifigan_state_dict`` with
    # speechbrain's ``.conv`` nesting stripped
    # (``convert.zoo.convert_wavlm_kmeans_vocoder``).
    vocoder_variant: str = "seanet"
    vocoder_filters: int = 32
    vocoder_ratios: tuple[int, ...] = (8, 5, 4, 2)

    def vocoder(self) -> SEANetConfig:
        return SEANetConfig(
            audio_channels=1,
            num_filters=self.vocoder_filters,
            hidden_size=self.wavlm.hidden_size,
            ratios=self.vocoder_ratios,
            num_lstm_layers=0,
            causal=False,
            pad_mode="reflect",
            use_conv_shortcut=False,
        )

    def hifigan(self):
        from audiocodecs_tpu.nn.hifigan import HiFiGANConfig

        return HiFiGANConfig(
            num_mels=self.wavlm.hidden_size,
            upsample_rates=(10, 8, 2, 2),  # 320 = 16 kHz / 50 Hz frames
            upsample_kernel_sizes=(20, 16, 4, 4),
            upsample_initial_channel=512,
        )


class WavLMKmeans(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        return WavLMKmeansModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: Optional[int] = None,
        layer_ids: Optional[tuple[int, ...]] = None,
        model_config: Optional[WavLMKmeansModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        mc = model_config or WavLMKmeansModelConfig(
            sampling_rate=orig_sample_rate
        )
        if layer_ids is not None:
            mc = dataclasses.replace(mc, layer_ids=tuple(layer_ids))
        self.model_config = mc
        K = len(mc.layer_ids)
        if num_codebooks is not None and num_codebooks != K:
            raise ValueError(
                f"num_codebooks ({num_codebooks}) must equal "
                f"len(layer_ids) ({K})"
            )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=K,
            vocab_size=mc.num_clusters,
        )
        if params is None:
            params = init_wavlm_kmeans_params(
                key if key is not None else jax.random.PRNGKey(0), mc
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if k not in ("vocoder", "dequantizer")}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "wavlm"}
        super().__init__(cfg, params)

    def _ssl_feats(self, params, sig):
        """[B, T] → per-selected-layer features [B, N, L, H]."""
        mc = self.model_config
        hidden = apply_wavlm(params["wavlm"], sig, mc.wavlm,
                             output_hidden_states=True)  # [L+1, B, N, H]
        sel = jnp.stack([hidden[l] for l in mc.layer_ids], axis=2)
        return sel  # [B, N, K, H]

    def _sig_to_feats(self, params, sig, length):
        del length
        feats = self._ssl_feats(params, sig)
        return feats.mean(axis=2)  # collapse layer axis → [B, N, H]

    def _sig_to_toks(self, params, sig, length):
        feats = self._ssl_feats(params, sig)  # [B, N, K, H]
        toks = [
            vq_encode(feats[:, :, k], params["kmeans"][k])
            for k in range(feats.shape[2])
        ]
        return jnp.stack(toks, axis=-1)

    def _toks_to_qfeats(self, params, toks, length):
        qs = [
            vq_decode(toks[..., k], params["kmeans"][k])
            for k in range(toks.shape[-1])
        ]
        q = jnp.stack(qs, axis=2).mean(axis=2)  # [B, N, H]
        return jnp.einsum("bnh,hd->bnd", q, params["dequantizer"]["w"]) + (
            params["dequantizer"]["b"]
        )

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    def _vocode(self, params, h):
        mc = self.model_config
        if mc.vocoder_variant == "hifigan":
            from audiocodecs_tpu.nn.hifigan import apply_hifigan

            return apply_hifigan(params["vocoder"], h, mc.hifigan())
        return apply_decoder(params["vocoder"], h, mc.vocoder())[:, :, 0]

    def _toks_to_sig(self, params, toks, length):
        q = self._toks_to_qfeats(params, toks, length)
        return self._vocode(params, q)

    def _feats_to_sig(self, params, feats, length):
        h = jnp.einsum("bnh,hd->bnd", feats, params["dequantizer"]["w"]) + (
            params["dequantizer"]["b"]
        )
        return self._vocode(params, h)

    def embs(self) -> jax.Array:
        return self.params["kmeans"]  # [K, C, H]


def init_wavlm_kmeans_params(key, cfg: WavLMKmeansModelConfig):
    from audiocodecs_tpu.nn.wavlm import WavLMConfig  # noqa: F401

    k1, k2, k3, k4 = jax.random.split(key, 4)
    H = cfg.wavlm.hidden_size
    voc = cfg.vocoder()
    return {
        "wavlm": _init_wavlm_params(k1, cfg.wavlm),
        "kmeans": jax.random.normal(
            k2, (len(cfg.layer_ids), cfg.num_clusters, H)
        ),
        "dequantizer": {
            "w": jax.random.normal(k3, (H, H)) * H**-0.5,
            "b": jnp.zeros((H,)),
        },
        "vocoder": (
            _init_hifigan(k4, cfg)
            if cfg.vocoder_variant == "hifigan"
            else init_seanet_params(k4, voc, seanet_decoder_plan(voc))
        ),
    }


def _init_hifigan(key, cfg: WavLMKmeansModelConfig):
    from audiocodecs_tpu.nn.hifigan import init_hifigan_params

    return init_hifigan_params(key, cfg.hifigan())


def _init_wavlm_params(key, cfg: WavLMConfig):
    """Random-init WavLM params (tests / training; real use converts HF)."""
    import numpy as np

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def lin(i, o, bias=True):
        p = {"w": jnp.asarray(rng.standard_normal((i, o)) * i**-0.5,
                              jnp.float32)}
        if bias:
            p["b"] = jnp.zeros((o,))
        return p

    def ln(d):
        return {"g": jnp.ones((d,)), "b": jnp.zeros((d,))}

    conv_layers = []
    cin = 1
    for i, (c, k) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel)):
        layer = {"w": jnp.asarray(
            rng.standard_normal((k, cin, c)) * (cin * k) ** -0.5, jnp.float32)}
        if cfg.conv_bias:
            layer["b"] = jnp.zeros((c,))
        if cfg.feat_extract_norm == "layer":
            layer["ln"] = ln(c)
        elif i == 0:
            layer["gn"] = ln(c)
        conv_layers.append(layer)
        cin = c

    H, D = cfg.hidden_size, cfg.head_dim
    layers = []
    for _ in range(cfg.num_layers):
        gate = {}
        if cfg.gated_rel_pos:
            gate = {
                "gru_w": jnp.asarray(rng.standard_normal((D, 8)) * D**-0.5,
                                     jnp.float32),
                "gru_b": jnp.zeros((8,)),
                "gru_const": jnp.ones((1, 1, cfg.num_heads, 1)),
            }
        layers.append(
            {
                "q": lin(H, H), "k": lin(H, H), "v": lin(H, H), "o": lin(H, H),
                **gate,
                "ln1": ln(H),
                "ff1": lin(H, cfg.intermediate_size),
                "ff2": lin(cfg.intermediate_size, H),
                "ln2": ln(H),
            }
        )
    g = cfg.num_conv_pos_embedding_groups
    return {
        "feature_extractor": {"conv_layers": conv_layers},
        "proj_ln": ln(cfg.conv_dim[-1]),
        "proj": lin(cfg.conv_dim[-1], H),
        "pos_conv": {
            "w": jnp.asarray(
                rng.standard_normal(
                    (cfg.num_conv_pos_embeddings, H // g, H)) * 0.01,
                jnp.float32,
            ),
            "b": jnp.zeros((H,)),
        },
        "encoder_ln": ln(H),
        **({"rel_attn_embed": jnp.asarray(
            rng.standard_normal((cfg.num_buckets, cfg.num_heads)) * 0.02,
            jnp.float32,
        )} if cfg.gated_rel_pos else {}),
        "layers": layers,
    }
