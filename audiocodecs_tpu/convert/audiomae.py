"""AudioMAE (timm ViT) checkpoint → JAX params for nn/audiomae.py.

The released SemantiCodec checkpoints carry the AudioMAE encoder with timm
vision-transformer naming (reference loads it through the vendor package,
``audiocodecs/semanticodec.py:68-74``):

  patch_embed.proj.{weight,bias}     Conv2d(1, D, 16, 16)
  cls_token                          [1, 1, D]
  pos_embed                          [1, 1+P, D]
  blocks.{i}.norm1.{weight,bias}
  blocks.{i}.attn.qkv.{weight,bias}  fused [3D, D]
  blocks.{i}.attn.proj.{weight,bias}
  blocks.{i}.norm2.{weight,bias}
  blocks.{i}.mlp.fc1.{weight,bias}   [4D, D]
  blocks.{i}.mlp.fc2.{weight,bias}
  norm.{weight,bias}
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import to_np
from audiocodecs_tpu.nn.audiomae import AudioMAEConfig

__all__ = ["convert_audiomae_state_dict", "audiomae_schema"]


def _lin(sd, prefix):
    w = to_np(sd[f"{prefix}.weight"]).astype(np.float32)
    return {"w": np.ascontiguousarray(w.T),
            "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}


def _norm(sd, prefix):
    return {"g": to_np(sd[f"{prefix}.weight"]).astype(np.float32),
            "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32)}


def convert_audiomae_state_dict(sd, cfg: AudioMAEConfig,
                                prefix: str = "") -> dict:
    """``prefix`` handles nested placement inside a larger checkpoint."""
    p = prefix
    w = to_np(sd[f"{p}patch_embed.proj.weight"]).astype(np.float32)
    D = w.shape[0]
    patch = {
        "w": np.ascontiguousarray(w.reshape(D, -1).T),  # [ps², D]
        "b": to_np(sd[f"{p}patch_embed.proj.bias"]).astype(np.float32),
    }
    params = {
        "patch_embed": patch,
        "cls_token": to_np(sd[f"{p}cls_token"]).astype(np.float32).reshape(1, D),
        "pos_embed": to_np(sd[f"{p}pos_embed"]).astype(np.float32)[0],
        "norm": _norm(sd, f"{p}norm"),
        "blocks": [],
    }
    for i in range(cfg.num_layers):
        b = f"{p}blocks.{i}"
        params["blocks"].append({
            "norm1": _norm(sd, f"{b}.norm1"),
            "attn": {"qkv": _lin(sd, f"{b}.attn.qkv"),
                     "proj": _lin(sd, f"{b}.attn.proj")},
            "norm2": _norm(sd, f"{b}.norm2"),
            "mlp": {"fc1": _lin(sd, f"{b}.mlp.fc1"),
                    "fc2": _lin(sd, f"{b}.mlp.fc2")},
        })
    return params


def audiomae_schema(cfg: AudioMAEConfig, prefix: str = "") -> dict:
    D = cfg.hidden_size
    hidden = int(D * cfg.mlp_ratio)
    p = prefix
    schema = {
        f"{p}patch_embed.proj.weight": (D, 1, cfg.patch_size, cfg.patch_size),
        f"{p}patch_embed.proj.bias": (D,),
        f"{p}cls_token": (1, 1, D),
        f"{p}pos_embed": (1, cfg.num_patches + 1, D),
        f"{p}norm.weight": (D,), f"{p}norm.bias": (D,),
    }
    for i in range(cfg.num_layers):
        b = f"{p}blocks.{i}"
        schema.update({
            f"{b}.norm1.weight": (D,), f"{b}.norm1.bias": (D,),
            f"{b}.attn.qkv.weight": (3 * D, D), f"{b}.attn.qkv.bias": (3 * D,),
            f"{b}.attn.proj.weight": (D, D), f"{b}.attn.proj.bias": (D,),
            f"{b}.norm2.weight": (D,), f"{b}.norm2.bias": (D,),
            f"{b}.mlp.fc1.weight": (hidden, D), f"{b}.mlp.fc1.bias": (hidden,),
            f"{b}.mlp.fc2.weight": (D, hidden), f"{b}.mlp.fc2.bias": (D,),
        })
    return schema
