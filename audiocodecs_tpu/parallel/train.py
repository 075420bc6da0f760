"""Sharded codec training step (VQ-VAE style) over a ``(data, model)`` mesh.

The reference never trains codecs (frozen pretrained wrappers) and trains
downstream probes with torch DDP. Here the training path is SPMD-native:
params carry ``NamedSharding`` (tensor-parallel channel/vocab sharding on the
``model`` axis), batches are sharded on ``data``, and a single jitted step
computes straight-through-estimator RVQ losses; XLA inserts all gradient
collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiocodecs_tpu.models.encodec import EncodecModelConfig
from audiocodecs_tpu.nn.seanet import apply_decoder, apply_encoder
from audiocodecs_tpu.quant.rvq import rvq_quantize

__all__ = ["shard_codec_params", "make_codec_train_step", "codec_loss"]


def _leaf_spec(path: str, leaf: np.ndarray, mp: int) -> P:
    """Choose a tensor-parallel partition spec for one parameter leaf.

    Heuristic Megatron-style channel sharding, applied through GSPMD: conv
    kernels shard the output-channel axis, LSTM gate matrices the 4H axis,
    codebooks the vocab axis. Any axis not divisible by ``mp`` is replicated —
    XLA's propagation fills in activation shardings and collectives.
    """
    shape = leaf.shape
    if leaf.ndim == 0 or mp == 1:
        return P()
    if "codebooks" in path and leaf.ndim == 3 and shape[1] % mp == 0:
        return P(None, "model", None)  # [K, C, H] → vocab-parallel
    if leaf.ndim == 3 and shape[2] % mp == 0:
        return P(None, None, "model")  # conv [K, Cin, Cout] → out-channel
    if leaf.ndim == 2 and shape[1] % mp == 0:
        return P(None, "model")  # lstm [in, 4H] → gate-parallel
    if leaf.ndim == 1 and shape[0] % mp == 0:
        return P("model")
    return P()


def shard_codec_params(params: Any, mesh: Mesh) -> Any:
    """Place a codec param pytree on the mesh with TP shardings."""
    mp = mesh.shape.get("model", 1)

    def place(path, leaf):
        pstr = "/".join(str(p) for p in path)
        spec = _leaf_spec(pstr, np.asarray(leaf), mp)
        return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def codec_loss(params, sig: jax.Array, cfg: EncodecModelConfig,
               num_codebooks: int, commit_weight: float = 0.25):
    """VQ-VAE reconstruction + commitment + codebook losses.

    Straight-through estimator through the RVQ argmax; reconstruction is
    time-aligned by trimming to the shorter of input/output.
    """
    sea = cfg.seanet()
    feats = apply_encoder(params["encoder"], sig[:, :, None], sea)
    _, q = rvq_quantize(feats, params["codebooks"], num_codebooks)
    q_st = feats + jax.lax.stop_gradient(q - feats)
    rec = apply_decoder(params["decoder"], q_st, sea)[:, :, 0]
    T = min(rec.shape[1], sig.shape[1])
    recon = jnp.mean((rec[:, :T] - sig[:, :T]) ** 2)
    commit = jnp.mean((feats - jax.lax.stop_gradient(q)) ** 2)
    codebook = jnp.mean((q - jax.lax.stop_gradient(feats)) ** 2)
    return recon + commit_weight * commit + codebook, {
        "recon": recon,
        "commit": commit,
        "codebook": codebook,
    }


def make_codec_train_step(cfg: EncodecModelConfig, num_codebooks: int,
                          optimizer: optax.GradientTransformation):
    """Build the jittable ``(params, opt_state, sig) → (params, opt_state,
    metrics)`` step. Jit it under a mesh context; shardings on the inputs
    drive SPMD partitioning."""

    def step(params, opt_state, sig):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: codec_loss(p, sig, cfg, num_codebooks), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return step
