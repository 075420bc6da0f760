"""HF ``WhisperForConditionalGeneration`` checkpoint → JAX params.

The reference never converts Whisper — it downloads a faster-whisper
model at metric time (``/root/reference/downstream/metrics/dwer.py:33-49``).
This converter makes the dWER / PPL transcription backbone first-party:
``model.state_dict()`` → the :mod:`audiocodecs_tpu.nn.whisper` tree.

Strict: every checkpoint key must be consumed (unmapped keys raise),
matching the other converters in this package.
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import to_np
from audiocodecs_tpu.nn.whisper import WhisperConfig

__all__ = ["convert_whisper_state_dict", "whisper_config_from_hf"]


def whisper_config_from_hf(hf) -> WhisperConfig:
    return WhisperConfig.from_hf_dict(
        {v: getattr(hf, v) for v in WhisperConfig._HF_FIELDS.values()})


def _lin(sd, used, prefix):
    used.add(f"{prefix}.weight")
    p = {"w": np.ascontiguousarray(
        to_np(sd[f"{prefix}.weight"]).T.astype(np.float32))}
    if f"{prefix}.bias" in sd:
        used.add(f"{prefix}.bias")
        p["b"] = to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    return p


def _ln(sd, used, prefix):
    used.update({f"{prefix}.weight", f"{prefix}.bias"})
    return {"g": to_np(sd[f"{prefix}.weight"]).astype(np.float32),
            "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}


def _attn(sd, used, prefix):
    return {"q": _lin(sd, used, f"{prefix}.q_proj"),
            "k": _lin(sd, used, f"{prefix}.k_proj"),
            "v": _lin(sd, used, f"{prefix}.v_proj"),
            "o": _lin(sd, used, f"{prefix}.out_proj")}


def convert_whisper_state_dict(sd, cfg: WhisperConfig) -> dict:
    used: set[str] = set()

    def conv(prefix):
        used.update({f"{prefix}.weight", f"{prefix}.bias"})
        # torch Conv1d [out, in, k] → "TIO" [k, in, out]
        return {"w": np.ascontiguousarray(
            to_np(sd[f"{prefix}.weight"]).transpose(2, 1, 0).astype(np.float32)),
            "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}

    def emb(prefix):
        used.add(f"{prefix}.weight")
        return to_np(sd[f"{prefix}.weight"]).astype(np.float32)

    enc_layers = []
    for i in range(cfg.encoder_layers):
        p = f"model.encoder.layers.{i}"
        enc_layers.append({
            "ln1": _ln(sd, used, f"{p}.self_attn_layer_norm"),
            "attn": _attn(sd, used, f"{p}.self_attn"),
            "ln2": _ln(sd, used, f"{p}.final_layer_norm"),
            "mlp": {"fc1": _lin(sd, used, f"{p}.fc1"),
                    "fc2": _lin(sd, used, f"{p}.fc2")},
        })
    dec_layers = []
    for i in range(cfg.decoder_layers):
        p = f"model.decoder.layers.{i}"
        dec_layers.append({
            "ln1": _ln(sd, used, f"{p}.self_attn_layer_norm"),
            "self_attn": _attn(sd, used, f"{p}.self_attn"),
            "ln_x": _ln(sd, used, f"{p}.encoder_attn_layer_norm"),
            "cross_attn": _attn(sd, used, f"{p}.encoder_attn"),
            "ln2": _ln(sd, used, f"{p}.final_layer_norm"),
            "mlp": {"fc1": _lin(sd, used, f"{p}.fc1"),
                    "fc2": _lin(sd, used, f"{p}.fc2")},
        })

    params = {
        "encoder": {
            "conv1": conv("model.encoder.conv1"),
            "conv2": conv("model.encoder.conv2"),
            "pos": emb("model.encoder.embed_positions"),
            "layers": enc_layers,
            "ln_post": _ln(sd, used, "model.encoder.layer_norm"),
        },
        "decoder": {
            "embed": emb("model.decoder.embed_tokens"),
            "pos": emb("model.decoder.embed_positions"),
            "layers": dec_layers,
            "ln_post": _ln(sd, used, "model.decoder.layer_norm"),
        },
    }
    # proj_out is tied to embed_tokens (HF keeps a copy in some exports)
    if "proj_out.weight" in sd:
        tied = to_np(sd["proj_out.weight"]).astype(np.float32)
        if not np.array_equal(tied, params["decoder"]["embed"]):
            raise ValueError("proj_out is not tied to embed_tokens — "
                             "untied Whisper heads are not supported")
        used.add("proj_out.weight")
    unused = {k for k in sd if k not in used
              and not k.endswith("position_ids")}
    if unused:
        raise ValueError(f"unmapped Whisper checkpoint keys: {sorted(unused)[:8]}"
                         f" (+{max(0, len(unused) - 8)} more)")
    return params
