"""HF Mimi checkpoint → JAX params."""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import (
    conv_transpose_weight,
    conv_weight,
    to_np,
)
from audiocodecs_tpu.models.mimi import MimiModelConfig
from audiocodecs_tpu.nn.seanet import seanet_decoder_plan, seanet_encoder_plan

__all__ = ["convert_mimi_state_dict", "mimi_config_from_hf"]


def mimi_config_from_hf(hf) -> MimiModelConfig:
    return MimiModelConfig(
        sampling_rate=hf.sampling_rate,
        audio_channels=hf.audio_channels,
        num_filters=hf.num_filters,
        hidden_size=hf.hidden_size,
        upsampling_ratios=tuple(hf.upsampling_ratios),
        kernel_size=hf.kernel_size,
        last_kernel_size=hf.last_kernel_size,
        residual_kernel_size=hf.residual_kernel_size,
        dilation_growth_rate=hf.dilation_growth_rate,
        num_residual_layers=hf.num_residual_layers,
        compress=hf.compress,
        use_causal_conv=hf.use_causal_conv,
        pad_mode=hf.pad_mode,
        use_conv_shortcut=hf.use_conv_shortcut,
        trim_right_ratio=hf.trim_right_ratio,
        num_hidden_layers=hf.num_hidden_layers,
        num_attention_heads=hf.num_attention_heads,
        num_key_value_heads=hf.num_key_value_heads,
        head_dim=hf.head_dim,
        intermediate_size=hf.intermediate_size,
        norm_eps=hf.norm_eps,
        rope_theta=hf.rope_theta,
        sliding_window=hf.sliding_window,
        layer_scale_initial_scale=hf.layer_scale_initial_scale,
        codebook_size=hf.codebook_size,
        codebook_dim=hf.codebook_dim,
        num_quantizers=hf.num_quantizers,
        num_semantic_quantizers=hf.num_semantic_quantizers,
        frame_rate=hf.frame_rate,
        encodec_frame_rate=hf.encodec_frame_rate,
        upsample_groups=hf.upsample_groups,
    )


def _convert_resnet(sd, prefix: str, use_shortcut: bool) -> dict:
    p = {"block": [conv_weight(sd, f"{prefix}.block.1.conv"),
                   conv_weight(sd, f"{prefix}.block.3.conv")]}
    if use_shortcut:
        p["shortcut"] = conv_weight(sd, f"{prefix}.shortcut.conv")
    return p


def _convert_seanet(sd, plan, root: str, cfg: MimiModelConfig) -> dict:
    params = {}
    for spec in plan:
        kind, idx = spec[0], spec[1]
        prefix = f"{root}.layers.{idx}"
        if kind == "conv":
            params[str(idx)] = conv_weight(sd, f"{prefix}.conv")
        elif kind == "convtr":
            params[str(idx)] = conv_transpose_weight(sd, f"{prefix}.conv")
        elif kind == "resnet":
            params[str(idx)] = _convert_resnet(sd, prefix, cfg.use_conv_shortcut)
    return params


def _lin(sd, prefix):
    p = {"w": np.ascontiguousarray(to_np(sd[f"{prefix}.weight"]).T.astype(np.float32))}
    if f"{prefix}.bias" in sd:
        p["b"] = to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    return p


def _convert_transformer(sd, root: str, cfg: MimiModelConfig) -> dict:
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{root}.layers.{i}"
        layers.append(
            {
                "ln1": {
                    "g": to_np(sd[f"{p}.input_layernorm.weight"]).astype(np.float32),
                    "b": to_np(sd[f"{p}.input_layernorm.bias"]).astype(np.float32),
                },
                "q": _lin(sd, f"{p}.self_attn.q_proj"),
                "k": _lin(sd, f"{p}.self_attn.k_proj"),
                "v": _lin(sd, f"{p}.self_attn.v_proj"),
                "o": _lin(sd, f"{p}.self_attn.o_proj"),
                "ln2": {
                    "g": to_np(sd[f"{p}.post_attention_layernorm.weight"]).astype(np.float32),
                    "b": to_np(sd[f"{p}.post_attention_layernorm.bias"]).astype(np.float32),
                },
                "mlp": {
                    "fc1": _lin(sd, f"{p}.mlp.fc1"),
                    "fc2": _lin(sd, f"{p}.mlp.fc2"),
                },
                "scale_attn": to_np(sd[f"{p}.self_attn_layer_scale.scale"]).astype(np.float32),
                "scale_mlp": to_np(sd[f"{p}.mlp_layer_scale.scale"]).astype(np.float32),
            }
        )
    return {"layers": layers}


def _grouped_convtr_weight(sd, prefix: str, groups: int) -> np.ndarray:
    """Grouped ConvTranspose1d ``[Cin, Cout/g, K]`` → flipped
    ``[K, Cin/g, Cout]`` (group-major output ordering for lax)."""
    w = to_np(sd[f"{prefix}.weight"]).astype(np.float32)  # [Cin, Cout/g, K]
    cin, cout_g, K = w.shape
    cin_g = cin // groups
    w = w[:, :, ::-1]  # flip kernel
    # [Cin, Cout/g, K] → [g, Cin/g, Cout/g, K] → [K, Cin/g, g, Cout/g]
    w = w.reshape(groups, cin_g, cout_g, K).transpose(3, 1, 0, 2)
    return np.ascontiguousarray(w.reshape(K, cin_g, groups * cout_g))


def _rvq(sd, prefix: str, n: int, has_proj: bool) -> dict:
    cbs = []
    for k in range(n):
        p = f"{prefix}.layers.{k}.codebook"
        embed_sum = to_np(sd[f"{p}.embed_sum"]).astype(np.float64)
        usage = to_np(sd[f"{p}.cluster_usage"]).astype(np.float64)
        cbs.append((embed_sum / np.clip(usage, 1e-5, None)[:, None]).astype(np.float32))
    out = {"codebooks": np.stack(cbs)}
    if has_proj:
        # 1x1 convs, no bias: [D, H, 1] → [H, D]
        out["in_proj"] = np.ascontiguousarray(
            to_np(sd[f"{prefix}.input_proj.weight"])[:, :, 0].T.astype(np.float32)
        )
        out["out_proj"] = np.ascontiguousarray(
            to_np(sd[f"{prefix}.output_proj.weight"])[:, :, 0].T.astype(np.float32)
        )
    return out


def convert_mimi_state_dict(sd, cfg: MimiModelConfig) -> dict:
    sd = dict(sd)
    sea = cfg.seanet()
    ns = cfg.num_semantic_quantizers
    return {
        "encoder": _convert_seanet(sd, seanet_encoder_plan(sea), "encoder", cfg),
        "decoder": _convert_seanet(sd, seanet_decoder_plan(sea), "decoder", cfg),
        "encoder_transformer": _convert_transformer(sd, "encoder_transformer", cfg),
        "decoder_transformer": _convert_transformer(sd, "decoder_transformer", cfg),
        "downsample": {
            "w": conv_weight(sd, "downsample.conv")["w"],
        },
        "upsample": {
            "w": _grouped_convtr_weight(sd, "upsample.conv", cfg.upsample_groups),
        },
        "quantizer": {
            "semantic": _rvq(
                sd, "quantizer.semantic_residual_vector_quantizer", ns, True
            ),
            "acoustic": _rvq(
                sd,
                "quantizer.acoustic_residual_vector_quantizer",
                cfg.num_quantizers - ns,
                True,
            ),
        },
    }
