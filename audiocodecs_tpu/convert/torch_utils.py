"""Checkpoint-conversion helpers (PyTorch state dict → JAX pytrees).

Torch is only needed at conversion time, never at runtime: converters accept
any mapping of name → array-like (torch tensors, numpy arrays) and emit
plain numpy, which callers ship to device.

Layout conventions converted here once, globally:
  * Conv1d  ``[Cout, Cin, K]`` → ``[K, Cin, Cout]`` (channel-last 'HIO').
  * ConvTranspose1d ``[Cin, Cout, K]`` → kernel-flipped ``[K, Cin, Cout]``
    (our transposed conv is a plain input-dilated conv, see
    ``nn.layers.conv_transpose1d``).
  * weight-norm ``(g, v)`` pairs are folded into plain weights.
  * LSTM ``weight_ih/weight_hh`` are transposed for right-multiplication and
    the two bias vectors summed.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "to_np",
    "conv_weight",
    "conv_transpose_weight",
    "lstm_layer_params",
    "fold_weight_norm_np",
]


def to_np(x) -> np.ndarray:
    """torch.Tensor | np.ndarray | array-like → float/int numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def fold_weight_norm_np(g, v, reduce_axes=(1, 2)) -> np.ndarray:
    """w = g · v / ‖v‖ (per-output-channel norm), computed in float64."""
    g = to_np(g).astype(np.float64)
    v = to_np(v).astype(np.float64)
    norm = np.sqrt((v**2).sum(axis=reduce_axes, keepdims=True))
    return (g * v / norm).astype(np.float32)


def _get_conv_weight(sd, prefix: str) -> np.ndarray:
    """Fetch a conv weight, folding weight-norm if parametrized.

    Handles both torch's modern ``parametrizations.weight.original{0,1}``
    and legacy ``weight_g``/``weight_v`` naming.
    """
    if f"{prefix}.parametrizations.weight.original0" in sd:
        g = sd[f"{prefix}.parametrizations.weight.original0"]
        v = sd[f"{prefix}.parametrizations.weight.original1"]
        return fold_weight_norm_np(g, v)
    if f"{prefix}.weight_g" in sd:
        return fold_weight_norm_np(sd[f"{prefix}.weight_g"], sd[f"{prefix}.weight_v"])
    return to_np(sd[f"{prefix}.weight"]).astype(np.float32)


def conv_weight(sd, prefix: str) -> dict:
    """``{prefix}.{weight,bias}`` → ``{"w": [K, Cin, Cout], "b": [Cout]}``."""
    w = _get_conv_weight(sd, prefix)  # [Cout, Cin, K]
    out = {"w": np.ascontiguousarray(w.transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["b"] = to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    else:
        out["b"] = np.zeros(w.shape[0], dtype=np.float32)
    return out


def conv_transpose_weight(sd, prefix: str) -> dict:
    """ConvTranspose1d ``[Cin, Cout, K]`` → flipped ``[K, Cin, Cout]``."""
    w = _get_conv_weight(sd, prefix)  # [Cin, Cout, K] for transposed convs
    w = w[:, :, ::-1]  # flip kernel axis
    out = {"w": np.ascontiguousarray(w.transpose(2, 0, 1))}
    if f"{prefix}.bias" in sd:
        out["b"] = to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    else:
        out["b"] = np.zeros(w.shape[1], dtype=np.float32)
    return out


def lstm_layer_params(sd, prefix: str, num_layers: int) -> list:
    """``{prefix}.weight_ih_l{n}`` etc. → list of per-layer param dicts."""
    out = []
    for n in range(num_layers):
        w_ih = to_np(sd[f"{prefix}.weight_ih_l{n}"]).astype(np.float32)
        w_hh = to_np(sd[f"{prefix}.weight_hh_l{n}"]).astype(np.float32)
        b_ih = to_np(sd[f"{prefix}.bias_ih_l{n}"]).astype(np.float32)
        b_hh = to_np(sd[f"{prefix}.bias_hh_l{n}"]).astype(np.float32)
        out.append(
            {
                "w_ih": np.ascontiguousarray(w_ih.T),
                "w_hh": np.ascontiguousarray(w_hh.T),
                "b": b_ih + b_hh,
            }
        )
    return out
