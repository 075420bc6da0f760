"""HF ``Wav2Vec2BertModel`` state dict → ``nn.w2vbert`` params.

XCodec2's semantic branch (reference ``audiocodecs/xcodec2.py:55``) loads
``HKUST-Audio/xcodec2`` whose ``semantic_model`` is
``facebook/w2v-bert-2.0``. Inside the vendor checkpoint the keys carry a
``semantic_model.`` prefix; from a standalone HF model they are bare. Both
are accepted via ``prefix``.
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import to_np

__all__ = ["convert_w2vbert_state_dict"]


def _lin(sd, name):
    return {"w": np.ascontiguousarray(to_np(sd[f"{name}.weight"]).astype(np.float32).T),
            "b": to_np(sd[f"{name}.bias"]).astype(np.float32)}


def _norm(sd, name):
    return {"g": to_np(sd[f"{name}.weight"]).astype(np.float32),
            "b": to_np(sd[f"{name}.bias"]).astype(np.float32)}


def convert_w2vbert_state_dict(sd, num_layers: int = 24, prefix: str = ""):
    """State dict → params pytree for ``apply_w2vbert``.

    ``prefix`` e.g. ``"semantic_model."`` when converting out of the fused
    XCodec2 checkpoint.
    """
    p = prefix
    layers = []
    for i in range(num_layers):
        q = f"{p}encoder.layers.{i}"
        # pointwise convs are 1×1 [Cout, Cin, 1] → [Cin, Cout] matrices
        pw1 = to_np(sd[f"{q}.conv_module.pointwise_conv1.weight"])
        pw2 = to_np(sd[f"{q}.conv_module.pointwise_conv2.weight"])
        # depthwise [C, 1, K] → [K, 1, C]
        dw = to_np(sd[f"{q}.conv_module.depthwise_conv.weight"])
        layers.append({
            "ffn1_ln": _norm(sd, f"{q}.ffn1_layer_norm"),
            "ffn1": {"in": _lin(sd, f"{q}.ffn1.intermediate_dense"),
                     "out": _lin(sd, f"{q}.ffn1.output_dense")},
            "attn_ln": _norm(sd, f"{q}.self_attn_layer_norm"),
            "attn": {
                "q": _lin(sd, f"{q}.self_attn.linear_q"),
                "k": _lin(sd, f"{q}.self_attn.linear_k"),
                "v": _lin(sd, f"{q}.self_attn.linear_v"),
                "o": _lin(sd, f"{q}.self_attn.linear_out"),
                "dist_emb": to_np(
                    sd[f"{q}.self_attn.distance_embedding.weight"]
                ).astype(np.float32),
            },
            "conv": {
                "ln": _norm(sd, f"{q}.conv_module.layer_norm"),
                "pw1": np.ascontiguousarray(
                    pw1[:, :, 0].astype(np.float32).T),
                "dw": np.ascontiguousarray(
                    dw.astype(np.float32).transpose(2, 1, 0)),
                "dw_ln": _norm(sd, f"{q}.conv_module.depthwise_layer_norm"),
                "pw2": np.ascontiguousarray(
                    pw2[:, :, 0].astype(np.float32).T),
            },
            "ffn2_ln": _norm(sd, f"{q}.ffn2_layer_norm"),
            "ffn2": {"in": _lin(sd, f"{q}.ffn2.intermediate_dense"),
                     "out": _lin(sd, f"{q}.ffn2.output_dense")},
            "final_ln": _norm(sd, f"{q}.final_layer_norm"),
        })
    return {
        "proj_ln": _norm(sd, f"{p}feature_projection.layer_norm"),
        "proj": _lin(sd, f"{p}feature_projection.projection"),
        "layers": layers,
    }
