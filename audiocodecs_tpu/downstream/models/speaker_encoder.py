"""Speaker embedding model: WavLM x-vector, TPU-native.

Capability parity with the reference's speaker encoder (reference
``downstream/models/speaker_encoder.py:31-68`` wraps HF
``AutoModelForAudioXVector``): WavLM encoder → projector → 5 dilated TDNN
layers → statistics pooling (mean + unbiased std) → linear → x-vector
embedding. Weight-compatible with HF ``WavLMForXVector`` (e.g.
``microsoft/wavlm-base-sv``); used by the TTS recipe's speaker prompt and
the speaker-similarity metric.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import conv1d
from audiocodecs_tpu.nn.wavlm import WavLMConfig, apply_wavlm

__all__ = ["XVectorConfig", "apply_xvector", "convert_xvector_state_dict",
           "load_xvector"]


@dataclasses.dataclass(frozen=True)
class XVectorConfig:
    wavlm: WavLMConfig = dataclasses.field(default_factory=WavLMConfig)
    tdnn_dim: tuple[int, ...] = (512, 512, 512, 512, 1500)
    tdnn_kernel: tuple[int, ...] = (5, 3, 3, 1, 1)
    tdnn_dilation: tuple[int, ...] = (1, 2, 3, 1, 1)
    xvector_dim: int = 512
    use_weighted_layer_sum: bool = True


def apply_xvector(params, sig: jax.Array, cfg: XVectorConfig) -> jax.Array:
    """``[B, T]`` waveform → x-vector embeddings ``[B, xvector_dim]``."""
    if cfg.use_weighted_layer_sum:
        hidden = apply_wavlm(params["wavlm"], sig, cfg.wavlm,
                             output_hidden_states=True)  # [L+1, B, N, H]
        w = jax.nn.softmax(params["layer_weights"])
        x = jnp.einsum("l,lbnh->bnh", w, hidden)
    else:
        x = apply_wavlm(params["wavlm"], sig, cfg.wavlm)
    x = jnp.einsum("bnh,hd->bnd", x, params["projector"]["w"]) + (
        params["projector"]["b"]
    )
    for i in range(len(cfg.tdnn_dim)):
        p = params["tdnn"][i]
        x = conv1d(x, p["w"], p["b"], dilation=cfg.tdnn_dilation[i])
        x = jax.nn.relu(x)
    mean = jnp.mean(x, axis=1)
    # unbiased std (torch .std default)
    n = x.shape[1]
    var = jnp.sum((x - mean[:, None]) ** 2, axis=1) / jnp.maximum(n - 1, 1)
    stats = jnp.concatenate([mean, jnp.sqrt(var)], axis=-1)
    return jnp.einsum("bs,sd->bd", stats, params["feature_extractor"]["w"]) + (
        params["feature_extractor"]["b"]
    )


def convert_xvector_state_dict(sd, cfg: XVectorConfig) -> dict:
    """HF ``WavLMForXVector`` state dict → params pytree."""
    import numpy as np

    from audiocodecs_tpu.convert.torch_utils import to_np
    from audiocodecs_tpu.convert.wavlm import convert_wavlm_state_dict

    params = {
        "wavlm": convert_wavlm_state_dict(sd, cfg.wavlm, prefix="wavlm."),
        "projector": {
            "w": np.ascontiguousarray(
                to_np(sd["projector.weight"]).T.astype(np.float32)),
            "b": to_np(sd["projector.bias"]).astype(np.float32),
        },
        "feature_extractor": {
            "w": np.ascontiguousarray(
                to_np(sd["feature_extractor.weight"]).T.astype(np.float32)),
            "b": to_np(sd["feature_extractor.bias"]).astype(np.float32),
        },
    }
    if cfg.use_weighted_layer_sum:
        params["layer_weights"] = to_np(sd["layer_weights"]).astype(np.float32)
    tdnn = []
    for i, (k, dim) in enumerate(zip(cfg.tdnn_kernel, cfg.tdnn_dim)):
        cin = cfg.tdnn_dim[i - 1] if i > 0 else cfg.tdnn_dim[0]
        w = to_np(sd[f"tdnn.{i}.kernel.weight"]).astype(np.float32)
        # linear [Cout, k·Cin] with (k, Cin) ordering → [k, Cin, Cout]
        w = w.reshape(dim, k, cin).transpose(1, 2, 0)
        tdnn.append({
            "w": np.ascontiguousarray(w),
            "b": to_np(sd[f"tdnn.{i}.kernel.bias"]).astype(np.float32),
        })
    params["tdnn"] = tdnn
    return params


def load_xvector(checkpoint: str, config: dict | None = None):
    """Converted ``wavlm_xvector`` .npz (see ``tools/convert_checkpoints.py``)
    → ``(params, cfg, embed_fn)`` with a jitted ``[B, T] → [B, D]`` embedder.

    ``config`` holds :class:`XVectorConfig` field overrides as plain dicts /
    lists (yaml-friendly); the nested ``wavlm`` dict maps to
    :class:`WavLMConfig`. Shared by the TTS recipe's speaker prompt and the
    first-party speaker-similarity metric.
    """
    from audiocodecs_tpu.utils.checkpoint import load_params

    def _tup(d):
        return {k: tuple(v) if isinstance(v, list) else v
                for k, v in d.items()}

    over = dict(config or {})
    cfg = XVectorConfig(
        wavlm=WavLMConfig(**_tup(over.pop("wavlm", {}))), **_tup(over)
    )
    params = load_params(checkpoint)
    # params as jit ARGUMENTS — closing over the ~300 MB tree would bake
    # it into the HLO as constants (rejected by the remote-compile tunnel)
    jfn = jax.jit(lambda p, sig: apply_xvector(p, sig, cfg))
    dev = jax.tree.map(jnp.asarray, params)
    embed_fn = lambda sig: jfn(dev, sig)  # noqa: E731
    return params, cfg, embed_fn
