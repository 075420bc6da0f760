"""HF WavLM checkpoint → JAX params."""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import to_np
from audiocodecs_tpu.nn.wavlm import WavLMConfig

__all__ = ["convert_wavlm_state_dict", "wavlm_config_from_hf",
           "wav2vec2_config_from_hf"]


def wavlm_config_from_hf(hf) -> WavLMConfig:
    return WavLMConfig(
        hidden_size=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        conv_dim=tuple(hf.conv_dim),
        conv_kernel=tuple(hf.conv_kernel),
        conv_stride=tuple(hf.conv_stride),
        conv_bias=hf.conv_bias,
        num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
        num_buckets=hf.num_buckets,
        max_distance=hf.max_bucket_distance,
        layer_norm_eps=hf.layer_norm_eps,
        do_stable_layer_norm=hf.do_stable_layer_norm,
        feat_extract_norm=hf.feat_extract_norm,
    )


def wav2vec2_config_from_hf(hf) -> WavLMConfig:
    """HF ``Wav2Vec2Config`` → the plain-attention tower variant."""
    return WavLMConfig(
        hidden_size=hf.hidden_size,
        num_layers=hf.num_hidden_layers,
        num_heads=hf.num_attention_heads,
        intermediate_size=hf.intermediate_size,
        conv_dim=tuple(hf.conv_dim),
        conv_kernel=tuple(hf.conv_kernel),
        conv_stride=tuple(hf.conv_stride),
        conv_bias=hf.conv_bias,
        num_conv_pos_embeddings=hf.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=hf.num_conv_pos_embedding_groups,
        layer_norm_eps=hf.layer_norm_eps,
        do_stable_layer_norm=hf.do_stable_layer_norm,
        feat_extract_norm=hf.feat_extract_norm,
        gated_rel_pos=False,
    )


def _lin(sd, prefix):
    p = {"w": np.ascontiguousarray(
        to_np(sd[f"{prefix}.weight"]).T.astype(np.float32))}
    if f"{prefix}.bias" in sd:
        p["b"] = to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    return p


def _ln(sd, prefix):
    return {"g": to_np(sd[f"{prefix}.weight"]).astype(np.float32),
            "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}


def convert_wavlm_state_dict(sd, cfg: WavLMConfig, prefix: str = "") -> dict:
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}

    conv_layers = []
    for i in range(len(cfg.conv_kernel)):
        p = f"feature_extractor.conv_layers.{i}"
        layer = {
            "w": np.ascontiguousarray(
                to_np(sd[f"{p}.conv.weight"]).transpose(2, 1, 0).astype(np.float32)
            )
        }
        if f"{p}.conv.bias" in sd:
            layer["b"] = to_np(sd[f"{p}.conv.bias"]).astype(np.float32)
        if f"{p}.layer_norm.weight" in sd:
            # base: GroupNorm after conv 0; large: per-layer LayerNorm
            key = "ln" if cfg.feat_extract_norm == "layer" else "gn"
            layer[key] = _ln(sd, f"{p}.layer_norm")
        conv_layers.append(layer)

    # pos conv: weight-norm folded over (Cout, Cin/g) per kernel position
    # (torch weight_norm dim=2 on [Cout, Cin/g, K]).
    if "encoder.pos_conv_embed.conv.parametrizations.weight.original0" in sd:
        g = to_np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original0"]).astype(np.float64)
        v = to_np(sd["encoder.pos_conv_embed.conv.parametrizations.weight.original1"]).astype(np.float64)
    else:
        g = to_np(sd["encoder.pos_conv_embed.conv.weight_g"]).astype(np.float64)
        v = to_np(sd["encoder.pos_conv_embed.conv.weight_v"]).astype(np.float64)
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    pos_w = (g * v / norm).astype(np.float32)  # [Cout, Cin/g, K]
    pos_conv = {
        "w": np.ascontiguousarray(pos_w.transpose(2, 1, 0)),
        "b": to_np(sd["encoder.pos_conv_embed.conv.bias"]).astype(np.float32),
    }

    layers = []
    for i in range(cfg.num_layers):
        p = f"encoder.layers.{i}"
        gate = {}
        if cfg.gated_rel_pos:
            gate = {
                "gru_w": np.ascontiguousarray(
                    to_np(sd[f"{p}.attention.gru_rel_pos_linear.weight"])
                    .T.astype(np.float32)
                ),
                "gru_b": to_np(
                    sd[f"{p}.attention.gru_rel_pos_linear.bias"]
                ).astype(np.float32),
                "gru_const": to_np(
                    sd[f"{p}.attention.gru_rel_pos_const"]
                ).reshape(1, 1, cfg.num_heads, 1).astype(np.float32),
            }
        layers.append(
            {
                "q": _lin(sd, f"{p}.attention.q_proj"),
                "k": _lin(sd, f"{p}.attention.k_proj"),
                "v": _lin(sd, f"{p}.attention.v_proj"),
                "o": _lin(sd, f"{p}.attention.out_proj"),
                **gate,
                "ln1": _ln(sd, f"{p}.layer_norm"),
                "ff1": _lin(sd, f"{p}.feed_forward.intermediate_dense"),
                "ff2": _lin(sd, f"{p}.feed_forward.output_dense"),
                "ln2": _ln(sd, f"{p}.final_layer_norm"),
            }
        )

    out = {
        "feature_extractor": {"conv_layers": conv_layers},
        "proj_ln": _ln(sd, "feature_projection.layer_norm"),
        "proj": _lin(sd, "feature_projection.projection"),
        "pos_conv": pos_conv,
        "encoder_ln": _ln(sd, "encoder.layer_norm"),
        "layers": layers,
    }
    if cfg.gated_rel_pos:
        out["rel_attn_embed"] = to_np(
            sd["encoder.layers.0.attention.rel_attn_embed.weight"]
        ).astype(np.float32)
    return out
