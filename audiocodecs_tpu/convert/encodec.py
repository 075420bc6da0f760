"""HF EnCodec checkpoint → JAX params.

Maps the ``facebook/encodec_*`` PyTorch state dict onto the SEANet layer plan
(:mod:`audiocodecs_tpu.nn.seanet` — the plan's layer indices equal the
upstream sequential layer numbering, so conversion is mechanical).
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import (
    conv_transpose_weight,
    conv_weight,
    lstm_layer_params,
    to_np,
)
from audiocodecs_tpu.models.encodec import EncodecModelConfig
from audiocodecs_tpu.nn.seanet import seanet_decoder_plan, seanet_encoder_plan

__all__ = ["convert_encodec_state_dict", "encodec_config_from_hf"]


def encodec_config_from_hf(hf_config) -> EncodecModelConfig:
    """Build our architecture config from a HF ``EncodecConfig``."""
    return EncodecModelConfig(
        sampling_rate=hf_config.sampling_rate,
        audio_channels=hf_config.audio_channels,
        num_filters=hf_config.num_filters,
        hidden_size=hf_config.hidden_size,
        upsampling_ratios=tuple(hf_config.upsampling_ratios),
        kernel_size=hf_config.kernel_size,
        last_kernel_size=hf_config.last_kernel_size,
        residual_kernel_size=hf_config.residual_kernel_size,
        dilation_growth_rate=hf_config.dilation_growth_rate,
        num_residual_layers=hf_config.num_residual_layers,
        compress=hf_config.compress,
        num_lstm_layers=hf_config.num_lstm_layers,
        use_causal_conv=hf_config.use_causal_conv,
        pad_mode=hf_config.pad_mode,
        use_conv_shortcut=hf_config.use_conv_shortcut,
        trim_right_ratio=hf_config.trim_right_ratio,
        normalize=hf_config.normalize,
        chunk_length_s=hf_config.chunk_length_s,
        overlap=hf_config.overlap,
        codebook_size=hf_config.codebook_size,
        codebook_dim=hf_config.codebook_dim,
        num_quantizers=hf_config.num_quantizers,
    )


def _convert_resnet(sd, prefix: str) -> dict:
    """Resnet block: convs live at ``block.1`` / ``block.3`` (ELUs at 0/2)."""
    p = {"block": [conv_weight(sd, f"{prefix}.block.1.conv"),
                   conv_weight(sd, f"{prefix}.block.3.conv")]}
    if f"{prefix}.shortcut.conv.weight" in sd or any(
        k.startswith(f"{prefix}.shortcut.conv.") for k in sd
    ):
        p["shortcut"] = conv_weight(sd, f"{prefix}.shortcut.conv")
    return p


def _convert_plan(sd, plan, root: str, cfg: EncodecModelConfig) -> dict:
    params = {}
    for spec in plan:
        kind, idx = spec[0], spec[1]
        prefix = f"{root}.layers.{idx}"
        if kind == "conv":
            params[str(idx)] = conv_weight(sd, f"{prefix}.conv")
        elif kind == "convtr":
            params[str(idx)] = conv_transpose_weight(sd, f"{prefix}.conv")
        elif kind == "resnet":
            params[str(idx)] = _convert_resnet(sd, prefix)
        elif kind == "lstm":
            params[str(idx)] = lstm_layer_params(
                sd, f"{prefix}.lstm", cfg.num_lstm_layers
            )
    return params


def convert_encodec_state_dict(sd, cfg: EncodecModelConfig) -> dict:
    """Full state dict → ``{"encoder", "decoder", "codebooks"}`` pytree."""
    sd = {k: v for k, v in sd.items()}
    sea = cfg.seanet()
    params = {
        "encoder": _convert_plan(sd, seanet_encoder_plan(sea), "encoder", cfg),
        "decoder": _convert_plan(sd, seanet_decoder_plan(sea), "decoder", cfg),
    }
    codebooks = [
        to_np(sd[f"quantizer.layers.{k}.codebook.embed"]).astype(np.float32)
        for k in range(cfg.num_quantizers)
    ]
    params["codebooks"] = np.stack(codebooks)  # [K, C, H]
    return params
