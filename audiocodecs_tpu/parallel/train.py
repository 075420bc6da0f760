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
from audiocodecs_tpu.quant.rvq import rvq_quantize, rvq_quantize_stats

__all__ = ["shard_codec_params", "make_codec_train_step", "codec_loss",
           "init_codec_opt_state"]


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
               spec_weight: float = 0.0, ema: bool = False):
    """VQ-VAE reconstruction + commitment (+ codebook) losses, plus an
    optional multi-scale STFT term (``spec_weight`` > 0).

    Straight-through estimator through the RVQ argmax; reconstruction is
    time-aligned by trimming to the shorter of input/output.

    With ``ema=True`` the codebooks are trained by EMA statistics instead of
    gradients (the EnCodec-lineage EuclideanCodebook rule): the codebook loss
    term is dropped, codebooks enter the forward under ``stop_gradient``, and
    the aux carries per-stage (counts, sums, residuals) for the update in
    :func:`make_codec_train_step`.
    """
    sea = cfg.seanet()
    feats = apply_encoder(params["encoder"], sig[:, :, None], sea)
    if ema:
        cb = jax.lax.stop_gradient(params["codebooks"])
        _, q, counts, sums, residuals = rvq_quantize_stats(
            feats, cb, num_codebooks)
    else:
        _, q = rvq_quantize(feats, params["codebooks"], num_codebooks)
    q_st = feats + jax.lax.stop_gradient(q - feats)
    rec = apply_decoder(params["decoder"], q_st, sea)[:, :, 0]
    T = min(rec.shape[1], sig.shape[1])
    recon = jnp.mean((rec[:, :T] - sig[:, :T]) ** 2)
    commit = jnp.mean((feats - jax.lax.stop_gradient(q)) ** 2)
    loss = recon + commit_weight * commit
    metrics = {"recon": recon, "commit": commit}
    if not ema:
        codebook = jnp.mean((q - jax.lax.stop_gradient(feats)) ** 2)
        loss = loss + codebook
        metrics["codebook"] = codebook
    # spec_weight may be a traced scalar (curriculum schedule) — gate the
    # spec computation on the STATIC question "is it ever nonzero".
    with_spec = not (isinstance(spec_weight, (int, float))
                     and spec_weight == 0)
    if with_spec:
        spec = msstft_loss(rec[:, :T], sig[:, :T])
        loss = loss + spec_weight * spec
        metrics["spec"] = spec
    if ema:
        return loss, (metrics, (counts, sums, residuals))
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


def init_codec_opt_state(optimizer: optax.GradientTransformation,
                         params, num_codebooks: int):
    """Optimizer + quantizer-EMA state for :func:`make_codec_train_step`.

    The EMA sub-state holds per-code cluster sizes and embedding sums (the
    EuclideanCodebook sufficient statistics) plus an init/step counter used
    for data-dependent first-batch initialization and dead-code restart
    randomness.
    """
    cb = jnp.asarray(params["codebooks"])[:num_codebooks]
    qstate = {
        "cluster_size": jnp.zeros(cb.shape[:2], jnp.float32),
        "embed_sum": jnp.zeros(cb.shape, jnp.float32),
        "steps": jnp.zeros((), jnp.int32),
    }
    return optimizer.init(params), qstate


def _ema_codebook_update(params, qstate, stats, num_codebooks: int,
                         decay: float, expire_threshold: float):
    """Apply the EMA codebook rule + dead-code restarts.

    counts/sums are global-batch statistics (under pjit the reductions in
    ``rvq_quantize_stats`` already span the data axis — no manual all-reduce,
    GSPMD inserts it). Codes whose EMA cluster size falls below
    ``expire_threshold`` are restarted from random batch residual vectors,
    and on the very first step the statistics are adopted outright, giving a
    data-dependent initialization (the role kmeans-init plays in
    EnCodec-style trainers).
    """
    counts, sums, residuals = stats  # [K,C], [K,C,H], [K,BN,H]
    K = num_codebooks
    C = counts.shape[1]
    first = qstate["steps"] == 0
    cs = jnp.where(first, counts,
                   decay * qstate["cluster_size"] + (1.0 - decay) * counts)
    es = jnp.where(first, sums,
                   decay * qstate["embed_sum"] + (1.0 - decay) * sums)
    # Laplace-smoothed cluster means.
    eps = 1e-5
    n = jnp.sum(cs, axis=-1, keepdims=True)
    smoothed = (cs + eps) / (n + C * eps) * n
    embed = es / smoothed[..., None]
    # Dead-code restart: draw replacement vectors from this batch's
    # residuals at fold_in-derived pseudo-random rows (jit-safe, no host
    # RNG state).
    key = jax.random.fold_in(jax.random.PRNGKey(0x5EAC0DE), qstate["steps"])
    rows = jax.random.randint(key, (K, C), 0, residuals.shape[1])
    cand = jnp.take_along_axis(
        residuals, rows[..., None].astype(jnp.int32), axis=1
    ).astype(es.dtype)  # [K, C, H]
    dead = cs < expire_threshold
    embed = jnp.where(dead[..., None], cand, embed)
    cs = jnp.where(dead, 1.0, cs)
    es = jnp.where(dead[..., None], cand, es)
    codebooks = params["codebooks"]
    codebooks = codebooks.at[:K].set(embed.astype(codebooks.dtype))
    params = dict(params, codebooks=codebooks)
    qstate = {"cluster_size": cs, "embed_sum": es,
              "steps": qstate["steps"] + 1}
    return params, qstate


def make_codec_train_step(cfg: EncodecModelConfig, num_codebooks: int,
                          optimizer: optax.GradientTransformation,
                          spec_weight: float = 0.0,
                          ema_decay: float | None = 0.99,
                          expire_threshold: float = 1.0,
                          commit_weight: float = 0.25,
                          commit_warmup: int = 500,
                          spec_delay: int = 0, spec_ramp: int = 300):
    """Build the jittable ``(params, opt_state, sig) → (params, opt_state,
    metrics)`` step. Jit it under a mesh context; shardings on the inputs
    drive SPMD partitioning.

    By default codebooks train via EMA statistics with dead-code restarts
    (``ema_decay=0.99``) — gradient-only codebook learning collapses on
    diverse corpora (most codes never win an argmax, get no gradient, and
    the decoder regresses to the mean). ``opt_state`` must then come from
    :func:`init_codec_opt_state`. Pass ``ema_decay=None`` for the legacy
    pure-gradient rule with a plain ``optimizer.init`` state.

    The commitment weight ramps linearly over ``commit_warmup`` steps (EMA
    path only): at init the commit term is ~50× the reconstruction term and
    its gradient points straight at the encoder-collapse attractor
    (time-constant features quantize perfectly, the decoder regresses to
    silence); measured on the synthetic-quality corpus, a fixed 0.25 weight
    pins recon at signal power while weight 0 / warmed-up weight track the
    unquantized autoencoder.

    ``spec_delay``/``spec_ramp`` schedule the multi-scale STFT term as a
    curriculum (EMA path only): the phase-blind spectral objective has its
    own optimum at phase-incoherent reconstructions, and engaged from step
    0 it traps the run there — measured on the synthetic-quality corpus,
    spec_weight 2.0 AND 0.25 both pin waveform recon at signal power for
    1300+ steps (spec falling 4.4 → 1.5 the whole time) while the
    waveform-first curriculum converges normally; once the waveform term
    has phase-locked the decoder, the spectral term is indifferent to
    phase and only polishes magnitude envelopes.
    """
    use_ema = ema_decay is not None

    def step(params, opt_state, sig):
        if use_ema:
            adam_state, qstate = opt_state
            cw = commit_weight * jnp.minimum(
                1.0, qstate["steps"] / max(commit_warmup, 1))
            sw = (spec_weight * jnp.clip(
                (qstate["steps"] - spec_delay) / max(spec_ramp, 1),
                0.0, 1.0)) if spec_weight > 0 else 0.0
        else:
            adam_state = opt_state
            cw = commit_weight
            sw = spec_weight
        (loss, aux), grads = jax.value_and_grad(
            lambda p: codec_loss(p, sig, cfg, num_codebooks,
                                 commit_weight=cw,
                                 spec_weight=sw, ema=use_ema),
            has_aux=True,
        )(params)
        metrics, stats = aux if use_ema else (aux, None)
        updates, adam_state = optimizer.update(grads, adam_state, params)
        params = optax.apply_updates(params, updates)
        if use_ema:
            params, qstate = _ema_codebook_update(
                params, qstate, stats, num_codebooks, ema_decay,
                expire_threshold)
            # Fraction of codes that won ≥1 assignment in THIS batch
            # (the EMA cluster size is ≥ expire_threshold by construction
            # right after restarts, so it can't measure utilization).
            util = jnp.mean((stats[0] > 0).astype(jnp.float32))
            metrics = dict(metrics, codebook_util=util)
            opt_state = (adam_state, qstate)
        else:
            opt_state = adam_state
        metrics = dict(metrics, loss=loss)
        return params, opt_state, metrics

    return step
