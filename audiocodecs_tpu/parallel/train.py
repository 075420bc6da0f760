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


def msstft_loss(rec: jax.Array, sig: jax.Array,
                fft_sizes=(256, 512, 1024)) -> jax.Array:
    """Multi-scale STFT loss (linear-magnitude L1 + log-magnitude L1 over
    several resolutions) — the spectral term EnCodec/DAC-style codec
    training uses alongside the waveform loss; phase-blind, so it trains
    perceptual envelope where plain MSE plateaus."""
    from audiocodecs_tpu.downstream.metrics.dsp import stft_mag

    total = 0.0
    for n_fft in fft_sizes:
        hop = n_fft // 4
        sh = stft_mag(rec, n_fft, hop)
        sr = stft_mag(sig, n_fft, hop)
        total = total + jnp.mean(jnp.abs(sh - sr)) + jnp.mean(
            jnp.abs(jnp.log(sh + 1e-5) - jnp.log(sr + 1e-5)))
    return total / len(fft_sizes)


def codec_loss(params, sig: jax.Array, cfg: EncodecModelConfig,
               num_codebooks: int, commit_weight: float = 0.25,
               spec_weight: float = 0.0):
    """VQ-VAE reconstruction + commitment + codebook losses, plus an
    optional multi-scale STFT term (``spec_weight`` > 0).

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
    loss = recon + commit_weight * commit + codebook
    metrics = {"recon": recon, "commit": commit, "codebook": codebook}
    if spec_weight > 0:
        spec = msstft_loss(rec[:, :T], sig[:, :T])
        loss = loss + spec_weight * spec
        metrics["spec"] = spec
    return loss, metrics


def shard_llama_params(params: Any, mesh: Mesh) -> Any:
    """Megatron-style TP shardings for the downstream Llama decoder.

    q/k/v and MLP up/gate shard their output (head/FFN) axis over ``model``;
    o and MLP down shard the input axis; the token embedding table and the
    fused multi-codebook head are vocab-parallel. XLA/GSPMD inserts the
    all-reduces after o/down projections and the head gather.
    """
    mp = mesh.shape.get("model", 1)

    def place(path, leaf):
        leaf = np.asarray(leaf)
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        spec = P()
        if mp > 1 and leaf.ndim == 2:
            last = [k for k in keys if isinstance(k, str)]
            name = last[-1] if last else ""
            parent = last[-2] if len(last) > 1 else ""
            if name == "w":
                if parent in ("q", "k", "v", "gate", "up") and leaf.shape[1] % mp == 0:
                    spec = P(None, "model")
                elif parent in ("o", "down") and leaf.shape[0] % mp == 0:
                    spec = P("model", None)
                elif parent == "head" and leaf.shape[1] % mp == 0:
                    spec = P(None, "model")
            elif name == "table" and leaf.shape[0] % mp == 0:
                spec = P("model", None)
        return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def slm_interleaved_ce(logits, flat, mask, K: int, C: int):
    """The SLM objective: K-interleaved next-token CE with special tokens
    remapped past the per-codebook vocab (shared by the TP/SP and pipeline
    train steps). ``logits`` [B, L, K, C']; ``flat``/``mask`` [B, L]."""
    L = flat.shape[1]
    cb = (jnp.arange(L - 1) % K).astype(jnp.int32)
    lg = jnp.take_along_axis(
        logits[:, :-1], cb[None, :, None, None], axis=2)[:, :, 0]
    tgt = flat[:, 1:]
    head_tgt = jnp.where(tgt >= K * C, C + (tgt - K * C), tgt)
    ce = optax.softmax_cross_entropy_with_integer_labels(lg, head_tgt)
    m = mask[:, 1:]
    return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)


def make_slm_train_step(lcfg, optimizer: optax.GradientTransformation,
                        sequence_axis: str | None = None):
    """Jittable SLM training step: K-interleaved next-token CE over the
    Llama decoder (the downstream SLM recipe's loss, sharded via params).

    ``sequence_axis``: optional mesh axis name for **sequence parallelism** —
    activations are sharding-constrained to split the token axis across it
    (GSPMD inserts the attention all-gathers/collectives), on top of the
    data-parallel batch axis and Megatron TP on ``model``.
    """
    from audiocodecs_tpu.downstream.models.llama import (
        llama_embed,
        llama_forward,
    )

    K, C = lcfg.num_codebooks, lcfg.vocab_size

    def loss_fn(params, flat, mask):
        embs = llama_embed(params, flat, lcfg)
        if sequence_axis is not None:
            embs = jax.lax.with_sharding_constraint(
                embs, P("data", sequence_axis, None)
            )
        logits = llama_forward(params, embs, lcfg)
        if sequence_axis is not None:
            logits = jax.lax.with_sharding_constraint(
                logits, P("data", sequence_axis, None, None)
            )
        return slm_interleaved_ce(logits, flat, mask, K, C)

    def step(params, opt_state, flat, mask):
        loss, grads = jax.value_and_grad(loss_fn)(params, flat, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def make_codec_train_step(cfg: EncodecModelConfig, num_codebooks: int,
                          optimizer: optax.GradientTransformation,
                          spec_weight: float = 0.0):
    """Build the jittable ``(params, opt_state, sig) → (params, opt_state,
    metrics)`` step. Jit it under a mesh context; shardings on the inputs
    drive SPMD partitioning."""

    def step(params, opt_state, sig):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: codec_loss(p, sig, cfg, num_codebooks,
                                 spec_weight=spec_weight), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return step
