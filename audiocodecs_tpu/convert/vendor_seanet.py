"""Vendor-naming SEANet checkpoint walker (EnCodec-lineage packages).

The non-HF EnCodec lineage (facebook/encodec and its forks: speechtokenizer,
audiocraft/PAST, WavTokenizer's feature extractor) all name their SEANet
stacks the same way, differing only in the root prefix:

  {root}.model.{i}.conv.conv.{weight_g,weight_v,bias}          SConv1d
  {root}.model.{i}.convtr.convtr.{weight_g,weight_v,bias}      SConvTranspose1d
  {root}.model.{i}.block.{1,3}.conv.conv.*                     resnet convs
  {root}.model.{i}.shortcut.conv.conv.*                        resnet shortcut
  {root}.model.{i}.lstm.{weight_ih_l{n},weight_hh_l{n},bias_*} SLSTM
      (+ ``..._reverse`` when bidirectional)

(HF transformers renames these to ``{root}.layers.{i}...`` with
parametrized weight norm — handled by :mod:`audiocodecs_tpu.convert.encodec`;
this module handles the vendor originals, reference loaders at
``audiocodecs/speechtokenizer.py:52-60``, ``past.py:57``,
``wavtokenizer.py:70-76``.)

The sequential layer numbering equals our plan indices
(:func:`audiocodecs_tpu.nn.seanet.seanet_encoder_plan`), so conversion is a
mechanical walk. Schema builders emit the expected key→shape map for a
config — used by tests and to pre-validate real checkpoints before mapping.
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import (
    conv_transpose_weight,
    conv_weight,
    lstm_layer_params,
    to_np,
)
from audiocodecs_tpu.nn.seanet import (
    SEANetConfig,
    seanet_decoder_plan,
    seanet_encoder_plan,
)

__all__ = [
    "convert_vendor_seanet",
    "vendor_seanet_schema",
    "vendor_rvq_codebooks",
    "rvq_schema",
]


def _bilstm_layer_params(sd, prefix: str, num_layers: int) -> list:
    """PyTorch ``bidirectional=True`` LSTM → per-layer {fwd, bwd} dicts."""
    out = []
    for n in range(num_layers):
        layer = {}
        for tag, suffix in (("fwd", ""), ("bwd", "_reverse")):
            w_ih = to_np(sd[f"{prefix}.weight_ih_l{n}{suffix}"])
            w_hh = to_np(sd[f"{prefix}.weight_hh_l{n}{suffix}"])
            b = (to_np(sd[f"{prefix}.bias_ih_l{n}{suffix}"])
                 + to_np(sd[f"{prefix}.bias_hh_l{n}{suffix}"]))
            layer[tag] = {
                "w_ih": np.ascontiguousarray(w_ih.T.astype(np.float32)),
                "w_hh": np.ascontiguousarray(w_hh.T.astype(np.float32)),
                "b": b.astype(np.float32),
            }
        out.append(layer)
    return out


def convert_vendor_seanet(sd, cfg: SEANetConfig, root: str,
                          decoder: bool = False) -> dict:
    """Walk one vendor SEANet stack into our plan-indexed params dict."""
    plan = seanet_decoder_plan(cfg) if decoder else seanet_encoder_plan(cfg)
    params = {}
    for spec in plan:
        kind, idx = spec[0], spec[1]
        prefix = f"{root}.model.{idx}"
        if kind == "conv":
            params[str(idx)] = conv_weight(sd, f"{prefix}.conv.conv")
        elif kind == "convtr":
            params[str(idx)] = conv_transpose_weight(
                sd, f"{prefix}.convtr.convtr")
        elif kind == "resnet":
            p = {"block": [conv_weight(sd, f"{prefix}.block.1.conv.conv"),
                           conv_weight(sd, f"{prefix}.block.3.conv.conv")]}
            if any(k.startswith(f"{prefix}.shortcut.") for k in sd):
                p["shortcut"] = conv_weight(sd, f"{prefix}.shortcut.conv.conv")
            params[str(idx)] = p
        elif kind == "lstm":
            params[str(idx)] = lstm_layer_params(
                sd, f"{prefix}.lstm", cfg.num_lstm_layers)
        elif kind == "bilstm":
            params[str(idx)] = _bilstm_layer_params(
                sd, f"{prefix}.lstm", cfg.num_lstm_layers)
        elif kind != "elu":  # activations carry no params
            raise ValueError(kind)
    return params


def _conv_keys(prefix: str, cout: int, cin: int, k: int,
               transpose: bool = False) -> dict:
    # weight-norm pair: g = [Cout, 1, 1] (dim-0 norm); v = full kernel.
    # ConvTranspose1d stores [Cin, Cout, K] and norms over dims (0, 2)...
    # both vendor lineages keep g shaped like the weight with singleton
    # non-norm dims; we emit the ubiquitous Conv1d convention.
    if transpose:
        shape = (cin, cout, k)
        g = (cin, 1, 1)
    else:
        shape = (cout, cin, k)
        g = (cout, 1, 1)
    return {f"{prefix}.weight_g": g, f"{prefix}.weight_v": shape,
            f"{prefix}.bias": (cout,)}


def vendor_seanet_schema(cfg: SEANetConfig, root: str,
                         decoder: bool = False) -> dict:
    """Expected vendor state-dict key→shape map for one SEANet stack."""
    plan = seanet_decoder_plan(cfg) if decoder else seanet_encoder_plan(cfg)
    schema: dict = {}
    for spec in plan:
        kind, idx = spec[0], spec[1]
        prefix = f"{root}.model.{idx}"
        if kind == "conv":
            cin, cout, k = spec[2], spec[3], spec[4]
            schema.update(_conv_keys(f"{prefix}.conv.conv", cout, cin, k))
        elif kind == "convtr":
            cin, cout, k = spec[2], spec[3], spec[4]
            schema.update(_conv_keys(f"{prefix}.convtr.convtr", cout, cin, k,
                                     transpose=True))
        elif kind == "resnet":
            ch = spec[2]
            hid = ch // cfg.compress
            schema.update(_conv_keys(f"{prefix}.block.1.conv.conv", hid, ch,
                                     cfg.residual_kernel_size))
            schema.update(_conv_keys(f"{prefix}.block.3.conv.conv", ch, hid, 1))
            if cfg.use_conv_shortcut:
                schema.update(_conv_keys(f"{prefix}.shortcut.conv.conv",
                                         ch, ch, 1))
        elif kind in ("lstm", "bilstm"):
            ch = spec[2]
            suffixes = ("", "_reverse") if kind == "bilstm" else ("",)
            for n in range(cfg.num_lstm_layers):
                cin = ch if n == 0 else (2 * ch if kind == "bilstm" else ch)
                for sfx in suffixes:
                    schema[f"{prefix}.lstm.weight_ih_l{n}{sfx}"] = (4 * ch, cin)
                    schema[f"{prefix}.lstm.weight_hh_l{n}{sfx}"] = (4 * ch, ch)
                    schema[f"{prefix}.lstm.bias_ih_l{n}{sfx}"] = (4 * ch,)
                    schema[f"{prefix}.lstm.bias_hh_l{n}{sfx}"] = (4 * ch,)
    return schema


def vendor_rvq_codebooks(sd, num_quantizers: int,
                         root: str = "quantizer.vq.layers") -> np.ndarray:
    """``{root}.{k}._codebook.embed`` [C, H] → stacked [K, C, H]."""
    return np.stack([
        to_np(sd[f"{root}.{k}._codebook.embed"]).astype(np.float32)
        for k in range(num_quantizers)
    ])


def rvq_schema(num_quantizers: int, codebook_size: int, dim: int,
               root: str = "quantizer.vq.layers",
               buffers: bool = True) -> dict:
    schema = {}
    for k in range(num_quantizers):
        schema[f"{root}.{k}._codebook.embed"] = (codebook_size, dim)
        if buffers:  # EMA-VQ training buffers present in vendor checkpoints
            schema[f"{root}.{k}._codebook.embed_avg"] = (codebook_size, dim)
            schema[f"{root}.{k}._codebook.cluster_size"] = (codebook_size,)
            schema[f"{root}.{k}._codebook.inited"] = (1,)
    return schema
