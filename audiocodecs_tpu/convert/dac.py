"""HF/descript DAC checkpoint → JAX params."""

from __future__ import annotations

from audiocodecs_tpu.convert.torch_utils import (
    conv_transpose_weight,
    conv_weight,
    to_np,
)
from audiocodecs_tpu.models.dac import DACModelConfig

__all__ = ["convert_dac_state_dict", "dac_config_from_hf"]


def dac_config_from_hf(hf_config) -> DACModelConfig:
    return DACModelConfig(
        sampling_rate=hf_config.sampling_rate,
        encoder_hidden_size=hf_config.encoder_hidden_size,
        downsampling_ratios=tuple(hf_config.downsampling_ratios),
        decoder_hidden_size=hf_config.decoder_hidden_size,
        upsampling_ratios=tuple(hf_config.upsampling_ratios),
        hidden_size=hf_config.hidden_size,
        n_codebooks=hf_config.n_codebooks,
        codebook_size=hf_config.codebook_size,
        codebook_dim=hf_config.codebook_dim,
    )


def _alpha(sd, key):
    return to_np(sd[key]).reshape(-1).astype("float32")


def _res_unit(sd, prefix):
    return {
        "alpha1": _alpha(sd, f"{prefix}.snake1.alpha"),
        "conv1": conv_weight(sd, f"{prefix}.conv1"),
        "alpha2": _alpha(sd, f"{prefix}.snake2.alpha"),
        "conv2": conv_weight(sd, f"{prefix}.conv2"),
    }


def convert_dac_state_dict(sd, cfg: DACModelConfig) -> dict:
    sd = dict(sd)

    enc_blocks = []
    for i in range(len(cfg.downsampling_ratios)):
        p = f"encoder.block.{i}"
        enc_blocks.append(
            {
                "res": [_res_unit(sd, f"{p}.res_unit{j}") for j in (1, 2, 3)],
                "alpha_down": _alpha(sd, f"{p}.snake1.alpha"),
                "conv_down": conv_weight(sd, f"{p}.conv1"),
            }
        )
    encoder = {
        "conv_in": conv_weight(sd, "encoder.conv1"),
        "blocks": enc_blocks,
        "alpha_out": _alpha(sd, "encoder.snake1.alpha"),
        "conv_out": conv_weight(sd, "encoder.conv2"),
    }

    dec_blocks = []
    for i in range(len(cfg.upsampling_ratios)):
        p = f"decoder.block.{i}"
        dec_blocks.append(
            {
                "alpha_up": _alpha(sd, f"{p}.snake1.alpha"),
                "convtr": conv_transpose_weight(sd, f"{p}.conv_t1"),
                "res": [_res_unit(sd, f"{p}.res_unit{j}") for j in (1, 2, 3)],
            }
        )
    decoder = {
        "conv_in": conv_weight(sd, "decoder.conv1"),
        "blocks": dec_blocks,
        "alpha_out": _alpha(sd, "decoder.snake1.alpha"),
        "conv_out": conv_weight(sd, "decoder.conv2"),
    }

    quantizer = []
    for k in range(cfg.n_codebooks):
        p = f"quantizer.quantizers.{k}"
        quantizer.append(
            {
                "in_proj": conv_weight(sd, f"{p}.in_proj"),
                "out_proj": conv_weight(sd, f"{p}.out_proj"),
                "codebook": to_np(sd[f"{p}.codebook.weight"]).astype("float32"),
            }
        )
    return {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}
