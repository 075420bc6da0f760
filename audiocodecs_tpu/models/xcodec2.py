"""X-Codec 2.0, TPU-native (true vendor architecture).

Single-token 50 Hz codec (``HKUST-Audio/xcodec2``; reference wrapper
``audiocodecs/xcodec2.py:30-157``) with a **dual branch**:

  * acoustic: the BigCodec-lineage ``CodecEnc`` (snake residual units,
    hop 2·2·4·4·5 = 320, residual LSTM bottleneck → 1024-d);
  * semantic: HF ``facebook/w2v-bert-2.0`` **layer-16** hidden states over
    SeamlessM4T stacked mels (the wav is padded by 160 samples on each side
    so both branches land on the same 50 Hz grid), refined by a residual
    conv ``SemanticEncoder`` (1024-d);

fused by channel concat + ``fc_prior`` (2048→2048), quantized by ONE
**FSQ** (vector-quantize-pytorch ``ResidualFSQ(dim=2048, levels=[4]*8,
num_quantizers=1)``: project_in 2048→8, round, project_out 8→2048 —
4⁸ = 65536 tokens), and decoded by ``fc_post_a`` (2048→1024) → a
BS-RoFormer transformer backbone (12 blocks, 16 heads, RoPE) → linear ISTFT
head (n_fft 1280, hop 320, same-padding). ``fc_post_s`` (semantic
reconstruction head) exists only for training parity with the vendor
checkpoint.

Reference surface mapping: mode pruning drops the generator / the semantic+
acoustic encoders (``xcodec2.py:56-62``); ``embs()`` materializes the 8-d
FSQ lattice exactly like the vendor's ``_indices_to_codes`` (``:66-71``);
``_feats_to_sig`` decodes *without* re-quantizing (``:112-115``).

TPU notes: the semantic tower is 16 conformer layers of dense matmuls
(MXU-bound); the FSQ search is elementwise rounding (VPU, no codebook
lookup); the RoFormer decode is batched attention at 50 Hz so even minutes
of audio stay modest-length sequences.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.models.bigcodec import (
    BigCodecModelConfig,
    apply_codec_encoder,
    init_codec_encoder_params,
)
from audiocodecs_tpu.nn.layers import conv1d, pad1d
from audiocodecs_tpu.nn.roformer import (
    RoformerConfig,
    apply_roformer,
    init_roformer_params,
)
from audiocodecs_tpu.nn.vocos import istft
from audiocodecs_tpu.nn.w2vbert import (
    W2VBertConfig,
    apply_w2vbert,
    init_w2vbert_params,
    w2vbert_features,
)
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
    ngf: int = 48
    up_ratios: tuple[int, ...] = (2, 2, 4, 4, 5)  # hop 320 → 50 Hz
    dilations: tuple[int, ...] = (1, 3, 9)
    acoustic_dim: int = 1024
    semantic_dim: int = 1024
    fused_dim: int = 2048
    levels: tuple[int, ...] = (4, 4, 4, 4, 4, 4, 4, 4)  # 4^8 = 65536
    w2vbert: W2VBertConfig = dataclasses.field(default_factory=W2VBertConfig)
    semantic_layer: int = 16
    backbone_depth: int = 12
    backbone_heads: int = 16
    n_fft: int = 1280
    hop_length: int = 320

    def encoder(self) -> BigCodecModelConfig:
        return BigCodecModelConfig(
            sampling_rate=self.sampling_rate,
            ngf=self.ngf,
            up_ratios=self.up_ratios,
            dilations=self.dilations,
            hidden_size=self.acoustic_dim,
        )

    def backbone(self) -> RoformerConfig:
        head_dim = self.acoustic_dim // self.backbone_heads
        return RoformerConfig(
            dim=self.acoustic_dim,
            depth=self.backbone_depth,
            num_heads=self.backbone_heads,
            rope_dim=min(64, head_dim),
        )

    @property
    def vocab_size(self) -> int:
        out = 1
        for l in self.levels:
            out *= l
        return out


def _lin(x, p):
    return jnp.einsum("...i,io->...o", x, p["w"]) + p["b"]


def _semantic_encoder(params, x):
    """Vendor ``SemanticEncoder``: conv3 stem → (ReLU conv3)×2 residual →
    conv3 head, channel-last [B, N, C]. The stem/head biases are zero
    (vendor ``bias=False``) but kept in the pytree for a uniform layout."""
    h = conv1d(pad1d(x, 1, 1, mode="constant"), params["init"]["w"],
               params["init"]["b"])
    r = jax.nn.relu(h)
    r = conv1d(pad1d(r, 1, 1, mode="constant"), params["res1"]["w"],
               params["res1"]["b"])
    r = jax.nn.relu(r)
    r = conv1d(pad1d(r, 1, 1, mode="constant"), params["res2"]["w"],
               params["res2"]["b"])
    h = h + r
    return conv1d(pad1d(h, 1, 1, mode="constant"), params["final"]["w"],
                  params["final"]["b"])


class XCodec2(Codec):
    DEFAULT_ORIG_SR = 16000

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
                      if k not in ("backbone", "head", "fc_post_a")}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("encoder", "w2vbert", "semantic_encoder",
                                   "fc_prior", "fc_post_s")}
        super().__init__(cfg, params)

    # ----------------------------- encode ----------------------------- #

    def _latents(self, params, sig):
        """Dual-branch fusion → pre-VQ embedding [B, N, fused_dim]
        (= the vendor's ``encode_feats``)."""
        mc = self.model_config
        ac = apply_codec_encoder(params["encoder"], sig, mc.encoder())
        # vendor pads the wav by 160 per side before the mel front-end so
        # the 100 Hz frame grid centers align with the 320-hop acoustic grid
        feats = w2vbert_features(
            jnp.pad(sig, ((0, 0), (160, 160))), mc.sampling_rate
        )
        sem = apply_w2vbert(params["w2vbert"], feats, mc.w2vbert,
                            output_layer=mc.semantic_layer)
        sem = _semantic_encoder(params["semantic_encoder"], sem)
        N = min(ac.shape[1], sem.shape[1])
        fused = jnp.concatenate([sem[:, :N], ac[:, :N]], axis=-1)
        return _lin(fused, params["fc_prior"])

    def _quantize(self, params, z):
        e = _lin(z, params["quantizer"]["project_in"])
        codes = fsq_quantize(e, self.model_config.levels)
        return fsq_codes_to_indices(codes, self.model_config.levels)

    def _sig_to_feats(self, params, sig, length):
        del length
        return self._latents(params, sig)

    def _sig_to_toks(self, params, sig, length):
        del length
        return self._quantize(params, self._latents(params, sig))[..., None]

    def _toks_to_qfeats(self, params, toks, length):
        codes = fsq_indices_to_codes(toks[..., 0], self.model_config.levels)
        return _lin(codes, params["quantizer"]["project_out"])

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._toks_to_qfeats(params, toks, length)

    # ----------------------------- decode ----------------------------- #

    def _decode(self, params, q):
        """Post-VQ embedding [B, N, fused_dim] → waveform [B, N·hop]."""
        from audiocodecs_tpu.nn.layers import conv_role

        mc = self.model_config
        with conv_role("decoder"):
            h = _lin(q, params["fc_post_a"])
            bb = params["backbone"]
            h = conv1d(pad1d(h, 3, 3, mode="constant"), bb["embed"]["w"],
                       bb["embed"]["b"])
            mean = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.var(h, axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-6) * bb["norm_in"]["g"] + (
                bb["norm_in"]["b"])
            h = apply_roformer(bb["roformer"], h, mc.backbone())
            mean = jnp.mean(h, axis=-1, keepdims=True)
            var = jnp.var(h, axis=-1, keepdims=True)
            h = (h - mean) * jax.lax.rsqrt(var + 1e-6) * bb["norm_out"]["g"] + (
                bb["norm_out"]["b"])
            y = _lin(h, params["head"])
            half = mc.n_fft // 2 + 1
            mag = jnp.exp(jnp.clip(y[..., :half], max=100.0))
            phase = y[..., half:]
            return istft(mag * jnp.cos(phase), mag * jnp.sin(phase), mc.n_fft,
                         mc.hop_length, padding="same")

    def _toks_to_sig(self, params, toks, length):
        return self._decode(params, self._toks_to_qfeats(params, toks,
                                                         length))

    def _feats_to_sig(self, params, feats, length):
        # vendor decodes features directly, WITHOUT re-quantizing
        # (xcodec2.py:112-115)
        return self._decode(params, feats)

    def embs(self) -> jax.Array:
        """Materialized FSQ lattice [1, 65536, 8] (the vendor builds the
        same via ``_indices_to_codes``, ``xcodec2.py:66-71``)."""
        return jnp.asarray(
            fsq_implicit_codebook(self.model_config.levels)
        )[None]


def init_xcodec2_params(key, cfg: XCodec2ModelConfig):
    ks = jax.random.split(key, 12)
    A, S, F = cfg.acoustic_dim, cfg.semantic_dim, cfg.fused_dim
    D = len(cfg.levels)

    def lin(k, i, o):
        return {"w": jax.random.normal(k, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    def conv(k, kernel, cin, cout):
        return {"w": jax.random.normal(k, (kernel, cin, cout))
                * (kernel * cin) ** -0.5, "b": jnp.zeros((cout,))}

    W = cfg.w2vbert.hidden_size
    return {
        "encoder": init_codec_encoder_params(ks[0], cfg.encoder()),
        "w2vbert": init_w2vbert_params(ks[1], cfg.w2vbert),
        "semantic_encoder": {
            "init": conv(ks[2], 3, W, S),
            "res1": conv(ks[3], 3, S, S),
            "res2": conv(ks[4], 3, S, S),
            "final": conv(ks[5], 3, S, S),
        },
        "fc_prior": lin(ks[6], S + A, F),
        "fc_post_a": lin(ks[7], F, A),
        "fc_post_s": lin(ks[8], F, S),
        "quantizer": {
            "project_in": lin(ks[9], F, D),
            "project_out": lin(ks[10], D, F),
        },
        "backbone": {
            "embed": conv(jax.random.fold_in(ks[11], 0), 7, A, A),
            "norm_in": {"g": jnp.ones((A,)), "b": jnp.zeros((A,))},
            "roformer": init_roformer_params(
                jax.random.fold_in(ks[11], 1), cfg.backbone()),
            "norm_out": {"g": jnp.ones((A,)), "b": jnp.zeros((A,))},
        },
        "head": lin(jax.random.fold_in(ks[11], 2), A, cfg.n_fft + 2),
    }
