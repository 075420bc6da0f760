"""HF ``GPT2LMHeadModel`` checkpoint → JAX params.

The reference downloads its perplexity LM at metric time (reference
``downstream/metrics/perplexity.py:33-57``); this converter makes the LM
first-party: ``model.state_dict()`` → the :mod:`audiocodecs_tpu.nn.gpt2`
tree. HF stores GPT-2 projections as ``Conv1D`` with weight ``[in, out]``
— already our layout, so no transposes.

Strict: every checkpoint key must be consumed (unmapped keys raise),
matching the other converters in this package.
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import to_np
from audiocodecs_tpu.nn.gpt2 import GPT2Config

__all__ = ["convert_gpt2_state_dict", "gpt2_config_from_hf"]


def gpt2_config_from_hf(hf) -> GPT2Config:
    return GPT2Config.from_hf_dict(
        {v: getattr(hf, v) for v in GPT2Config._HF_FIELDS.values()})


def convert_gpt2_state_dict(sd, cfg: GPT2Config) -> dict:
    used: set[str] = set()

    def lin(prefix):
        used.update({f"{prefix}.weight", f"{prefix}.bias"})
        return {"w": to_np(sd[f"{prefix}.weight"]).astype(np.float32),
                "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}

    def ln(prefix):
        used.update({f"{prefix}.weight", f"{prefix}.bias"})
        return {"g": to_np(sd[f"{prefix}.weight"]).astype(np.float32),
                "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}

    def emb(prefix):
        used.add(f"{prefix}.weight")
        return to_np(sd[f"{prefix}.weight"]).astype(np.float32)

    layers = []
    for i in range(cfg.n_layer):
        p = f"transformer.h.{i}"
        layers.append({
            "ln1": ln(f"{p}.ln_1"),
            "attn": {"qkv": lin(f"{p}.attn.c_attn"),
                     "o": lin(f"{p}.attn.c_proj")},
            "ln2": ln(f"{p}.ln_2"),
            "mlp": {"fc1": lin(f"{p}.mlp.c_fc"),
                    "fc2": lin(f"{p}.mlp.c_proj")},
        })
    params = {
        "wte": emb("transformer.wte"),
        "wpe": emb("transformer.wpe"),
        "layers": layers,
        "ln_f": ln("transformer.ln_f"),
    }
    # lm_head is tied to wte (HF keeps a copy in the state dict)
    if "lm_head.weight" in sd:
        tied = to_np(sd["lm_head.weight"]).astype(np.float32)
        if not np.array_equal(tied, params["wte"]):
            raise ValueError("lm_head is not tied to wte — untied GPT-2 "
                             "heads are not supported")
        used.add("lm_head.weight")
    unused = {k for k in sd if k not in used
              and not k.endswith((".attn.bias", ".attn.masked_bias"))}
    if unused:
        raise ValueError(f"unmapped GPT-2 checkpoint keys: {sorted(unused)[:8]}"
                         f" (+{max(0, len(unused) - 8)} more)")
    return params
