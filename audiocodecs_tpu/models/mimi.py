"""Mimi (Kyutai/Moshi codec), TPU-native.

First-party JAX implementation, weight-compatible with the ``kyutai/mimi``
PyTorch checkpoint. Replaces the reference's HF wrapper (reference
``audiocodecs/mimi.py:30-191``).

Architecture: causal SEANet conv encoder (no LSTM) → 8-layer transformer
(RoPE, LayerScale, sliding-window causal) → stride-2 downsample conv
(25 Hz → 12.5 Hz) → **split RVQ** (1 semantic + N acoustic codebooks, each
side with its own 1×1 input/output projections) → upsample transposed conv →
decoder transformer → SEANet conv decoder.

API parity with the reference wrapper (``mimi.py``):
  * ``num_codebooks`` = total codebooks (semantic first, then acoustic) —
    reference ``mimi.py:56-90`` splits semantic/acoustic the same way.
  * mode pruning drops the whole decode tower incl. its transformer
    (reference prunes encoder/decoder *and* transformers, ``mimi.py:46-51``).
  * ``sig_to_feats`` = encoder → encoder transformer → downsample
    (pre-quantization, reference ``mimi.py:112-120``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import causal_conv1d, conv_transpose1d
from audiocodecs_tpu.nn.seanet import (
    SEANetConfig,
    apply_decoder,
    apply_encoder,
    init_seanet_params,
    seanet_decoder_plan,
    seanet_encoder_plan,
)
from audiocodecs_tpu.nn.transformer import (
    TransformerConfig,
    apply_transformer,
    init_transformer_params,
)
from audiocodecs_tpu.quant.rvq import rvq_decode, rvq_encode

__all__ = ["Mimi", "MimiModelConfig"]


@dataclasses.dataclass(frozen=True)
class MimiModelConfig:
    """Defaults = kyutai/mimi checkpoint."""

    sampling_rate: int = 24000
    audio_channels: int = 1
    num_filters: int = 64
    hidden_size: int = 512
    upsampling_ratios: tuple[int, ...] = (8, 6, 5, 4)
    kernel_size: int = 7
    last_kernel_size: int = 3
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    use_causal_conv: bool = True
    pad_mode: str = "constant"
    use_conv_shortcut: bool = False
    trim_right_ratio: float = 1.0
    # transformer
    num_hidden_layers: int = 8
    num_attention_heads: int = 8
    num_key_value_heads: int = 8
    head_dim: int = 64
    intermediate_size: int = 2048
    norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    sliding_window: int = 250
    layer_scale_initial_scale: float = 0.01
    # quantizer
    codebook_size: int = 2048
    codebook_dim: int = 256
    num_quantizers: int = 32
    num_semantic_quantizers: int = 1
    frame_rate: float = 12.5
    encodec_frame_rate: float = 25.0
    upsample_groups: int = 512

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
            num_lstm_layers=0,
            causal=self.use_causal_conv,
            pad_mode=self.pad_mode,
            use_conv_shortcut=self.use_conv_shortcut,
            trim_right_ratio=self.trim_right_ratio,
        )

    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            hidden_size=self.hidden_size,
            num_layers=self.num_hidden_layers,
            num_heads=self.num_attention_heads,
            num_kv_heads=self.num_key_value_heads,
            head_dim=self.head_dim,
            intermediate_size=self.intermediate_size,
            act="gelu",
            norm="layernorm",
            norm_eps=self.norm_eps,
            rope_theta=self.rope_theta,
            use_layer_scale=True,
            sliding_window=self.sliding_window,
            attention_bias=False,
            causal=True,
        )

    @property
    def downsample_stride(self) -> int:
        return int(self.encodec_frame_rate / self.frame_rate)


def _encode_tower(params, sig, cfg: MimiModelConfig):
    """waveform [B, T] → pre-quantization embeddings [B, N, hidden]."""
    x = apply_encoder(params["encoder"], sig[:, :, None], cfg.seanet())
    x = apply_transformer(params["encoder_transformer"], x, cfg.transformer())
    stride = cfg.downsample_stride
    x = causal_conv1d(
        x, params["downsample"]["w"], None, stride=stride,
        causal=cfg.use_causal_conv, pad_mode="replicate",
    )
    return x


def _decode_tower(params, q, cfg: MimiModelConfig):
    """quantized embeddings [B, N, hidden] → waveform [B, T]."""
    stride = cfg.downsample_stride
    kernel = 2 * stride
    y = conv_transpose1d(q, params["upsample"]["w"], None, stride=stride,
                         groups=cfg.upsample_groups)
    padding_total = kernel - stride
    right = math.ceil(padding_total * cfg.trim_right_ratio)
    left = padding_total - right
    y = y[:, left : y.shape[1] - right]
    y = apply_transformer(params["decoder_transformer"], y, cfg.transformer())
    y = apply_decoder(params["decoder"], y, cfg.seanet())
    return y[:, :, 0]


def _split_rvq_encode(params, emb, num_codebooks: int,
                      num_semantic: int) -> jax.Array:
    """[B, N, hidden] → [B, N, K]; semantic stage(s) first, then acoustic."""
    sem = params["semantic"]
    z = jnp.einsum("bnh,hd->bnd", emb, sem["in_proj"])
    sem_toks = rvq_encode(z, sem["codebooks"], num_semantic)
    parts = [sem_toks]
    if num_codebooks > num_semantic:
        ac = params["acoustic"]
        z = jnp.einsum("bnh,hd->bnd", emb, ac["in_proj"])
        parts.append(rvq_encode(z, ac["codebooks"], num_codebooks - num_semantic))
    return jnp.concatenate(parts, axis=-1)


def _split_rvq_decode(params, toks, num_semantic: int) -> jax.Array:
    """[B, N, K] → [B, N, hidden]."""
    sem = params["semantic"]
    q = rvq_decode(toks[..., :num_semantic], sem["codebooks"])
    out = jnp.einsum("bnd,dh->bnh", q, sem["out_proj"])
    if toks.shape[-1] > num_semantic:
        ac = params["acoustic"]
        qa = rvq_decode(toks[..., num_semantic:], ac["codebooks"])
        out = out + jnp.einsum("bnd,dh->bnh", qa, ac["out_proj"])
    return out


class Mimi(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 24000):
        return MimiModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 24000,
        mode: str = "reconstruct",
        num_codebooks: int = 8,
        model_config: Optional[MimiModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        self.model_config = model_config or MimiModelConfig(
            sampling_rate=orig_sample_rate
        )
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_mimi_params(
                key if key is not None else jax.random.PRNGKey(0), self.model_config
            )
        if mode == "encode":
            params = {k: v for k, v in params.items()
                      if k not in ("decoder", "decoder_transformer", "upsample")}
        elif mode == "decode":
            params = {k: v for k, v in params.items()
                      if k not in ("encoder", "encoder_transformer", "downsample")}
        super().__init__(cfg, params)

    def _sig_to_feats(self, params, sig, length):
        del length
        return _encode_tower(params, sig, self.model_config)

    def _sig_to_toks(self, params, sig, length):
        emb = _encode_tower(params, sig, self.model_config)
        return _split_rvq_encode(
            params["quantizer"], emb, self.config.num_codebooks,
            self.model_config.num_semantic_quantizers,
        )

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return _split_rvq_decode(
            params["quantizer"], toks, self.model_config.num_semantic_quantizers
        )

    def _toks_to_qfeats(self, params, toks, length):
        return _split_rvq_decode(
            params["quantizer"], toks, self.model_config.num_semantic_quantizers
        )

    def _toks_to_sig(self, params, toks, length):
        q = _split_rvq_decode(
            params["quantizer"], toks, self.model_config.num_semantic_quantizers
        )
        return _decode_tower(params, q, self.model_config)

    # ------------------------------------------------------------------ #
    # Streaming (chunked-causal) API — BASELINE config #4
    # ------------------------------------------------------------------ #

    def init_streaming_state(self, batch: int):
        """Zero state for chunked encode+decode.

        Chunks must be whole frames (``frame_size`` samples). The downsample
        conv uses replicate padding at stream start (matching batch mode), so
        chunked and batch execution agree exactly on causal content.
        """
        from audiocodecs_tpu.nn.seanet import (
            init_stream_state,
            seanet_decoder_plan,
            seanet_encoder_plan,
        )
        from audiocodecs_tpu.nn.streaming import (
            init_conv_state,
            init_convtr_state,
            init_transformer_stream_state,
        )

        cfg = self.model_config
        sea = cfg.seanet()
        tcfg = cfg.transformer()
        stride = cfg.downsample_stride
        state = {}
        if "encoder" in self.params:
            state["encoder"] = init_stream_state(
                self.params["encoder"], seanet_encoder_plan(sea), sea, batch
            )
            state["encoder_transformer"] = init_transformer_stream_state(
                tcfg, batch
            )
            state["downsample"] = init_conv_state(
                batch, 2 * stride, stride, cfg.hidden_size
            )
            state["downsample_init"] = jnp.zeros((), bool)
        if "decoder" in self.params:
            state["decoder"] = init_stream_state(
                self.params["decoder"], seanet_decoder_plan(sea), sea, batch
            )
            state["decoder_transformer"] = init_transformer_stream_state(
                tcfg, batch
            )
            state["upsample"] = init_convtr_state(
                batch, 2 * stride, stride, cfg.hidden_size
            )
        return state

    @property
    def frame_size(self) -> int:
        """Samples per token frame (chunk granularity for streaming)."""
        cfg = self.model_config
        hop = 1
        for r in cfg.upsampling_ratios:
            hop *= r
        return hop * cfg.downsample_stride

    def encode_chunk(self, chunk: jax.Array, state):
        """One chunk ``[B, frame_size·m]`` → (tokens ``[B, m, K]``, state).

        Equivalent to the reference's streaming Mimi path (HF padding cache +
        transformer KV cache, reference ``mimi.py`` wraps it); here the whole
        step is one jitted pure function of (params, chunk, state).
        """
        return self._jitted("_encode_chunk")(self.params, chunk, state)

    def _encode_chunk(self, params, chunk, state):
        from audiocodecs_tpu.nn.seanet import (
            apply_plan_streaming,
            seanet_encoder_plan,
        )
        from audiocodecs_tpu.nn.streaming import (
            apply_transformer_streaming,
            conv_stream,
        )

        cfg = self.model_config
        sea = cfg.seanet()
        new_state = dict(state)
        x = chunk[:, :, None]
        x, new_state["encoder"] = apply_plan_streaming(
            x, params["encoder"], seanet_encoder_plan(sea), sea,
            state["encoder"],
        )
        x, new_state["encoder_transformer"] = apply_transformer_streaming(
            params["encoder_transformer"], x, cfg.transformer(),
            state["encoder_transformer"],
        )
        # Downsample conv pads with replicate at stream start (batch parity).
        ds_state = jnp.where(
            state["downsample_init"],
            state["downsample"],
            jnp.repeat(x[:, :1], state["downsample"].shape[1], axis=1),
        )
        x, new_state["downsample"] = conv_stream(
            x, ds_state, params["downsample"]["w"], None,
            stride=cfg.downsample_stride,
        )
        new_state["downsample_init"] = jnp.ones((), bool)
        toks = _split_rvq_encode(
            params["quantizer"], x, self.config.num_codebooks,
            cfg.num_semantic_quantizers,
        )
        return toks, new_state

    def decode_chunk(self, toks: jax.Array, state):
        """Token frames ``[B, m, K]`` → (waveform chunk, state)."""
        return self._jitted("_decode_chunk")(self.params, toks, state)

    def _decode_chunk(self, params, toks, state):
        from audiocodecs_tpu.nn.seanet import (
            apply_plan_streaming,
            seanet_decoder_plan,
        )
        from audiocodecs_tpu.nn.streaming import (
            apply_transformer_streaming,
            convtr_stream,
        )

        cfg = self.model_config
        sea = cfg.seanet()
        new_state = dict(state)
        q = _split_rvq_decode(params["quantizer"], toks,
                              cfg.num_semantic_quantizers)
        y, new_state["upsample"] = convtr_stream(
            q, state["upsample"], params["upsample"]["w"], None,
            stride=cfg.downsample_stride, groups=cfg.upsample_groups,
        )
        y, new_state["decoder_transformer"] = apply_transformer_streaming(
            params["decoder_transformer"], y, cfg.transformer(),
            state["decoder_transformer"],
        )
        y, new_state["decoder"] = apply_plan_streaming(
            y, params["decoder"], seanet_decoder_plan(sea), sea,
            state["decoder"],
        )
        return y[:, :, 0], new_state

    def embs(self) -> jax.Array:
        """``[K, C, D]`` VQ-space codebooks, semantic then acoustic
        (reference ``mimi.py`` exposes the same K×C×H tensor)."""
        K = self.config.num_codebooks
        ns = self.model_config.num_semantic_quantizers
        q = self.params["quantizer"]
        parts = [q["semantic"]["codebooks"][:ns]]
        if K > ns:
            parts.append(q["acoustic"]["codebooks"][: K - ns])
        return jnp.concatenate(parts, axis=0)


def init_mimi_params(key, cfg: MimiModelConfig):
    ks = jax.random.split(key, 10)
    sea = cfg.seanet()
    H, D = cfg.hidden_size, cfg.codebook_dim
    stride = cfg.downsample_stride

    def rvq(key, n):
        k1, k2, k3 = jax.random.split(key, 3)
        return {
            "in_proj": jax.random.normal(k1, (H, D)) * 0.05,
            "out_proj": jax.random.normal(k2, (D, H)) * 0.05,
            "codebooks": jax.random.normal(k3, (n, cfg.codebook_size, D)),
        }

    return {
        "encoder": init_seanet_params(ks[0], sea, seanet_encoder_plan(sea)),
        "decoder": init_seanet_params(ks[1], sea, seanet_decoder_plan(sea)),
        "encoder_transformer": init_transformer_params(ks[2], cfg.transformer()),
        "decoder_transformer": init_transformer_params(ks[3], cfg.transformer()),
        "downsample": {"w": jax.random.normal(ks[4], (2 * stride, H, H)) * 0.02},
        "upsample": {
            "w": jax.random.normal(
                ks[5], (2 * stride, H // cfg.upsample_groups, H)) * 0.02
        },
        "quantizer": {
            "semantic": rvq(ks[6], cfg.num_semantic_quantizers),
            "acoustic": rvq(ks[7], cfg.num_quantizers - cfg.num_semantic_quantizers),
        },
    }
