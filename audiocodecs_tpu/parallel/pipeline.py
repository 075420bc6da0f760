"""GPipe-style pipeline parallelism for the SLM decoder, TPU-native.

The reference's only distribution mechanism is SpeechBrain DDP
(``/root/reference/downstream/train_asr.py:213-214``); this module goes
beyond it with a pipeline dimension for the Llama decoder: the transformer
layers are split into contiguous stages across a mesh axis, microbatches
flow through the stages, and activations move stage→stage with
``lax.ppermute`` over the ICI ring — the canonical TPU pipeline pattern
(collective-permute instead of NCCL point-to-point).

Design:
  * stage layers are STACKED into one pytree with a leading ``[S, L/S]``
    axis sharded on the pipeline mesh axis — each device materializes only
    its own stage's weights;
  * one ``shard_map`` region runs the whole pipeline schedule; inside it a
    static Python loop of ``M + S − 1`` ticks (M microbatches, S stages)
    applies the local stage (a ``lax.scan`` over its layers) and rotates
    activations with ``ppermute``. Bubbles process zeros and are discarded;
  * ``ppermute`` is differentiable (its transpose is the reverse ring), so
    ``jax.grad`` through the schedule yields the standard GPipe backward —
    no hand-written backward pass;
  * embedding, final norm, and the multi-codebook head run OUTSIDE the
    pipeline region (data-parallel, optionally TP-sharded) — only the layer
    stack is pipelined, which is where the depth lives.

Composes with the existing axes: batch on ``data``, pipeline on ``model``
(reusing the 2-D mesh from :func:`audiocodecs_tpu.parallel.mesh.make_mesh`),
so dp×pp runs on the same mesh as dp×tp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from audiocodecs_tpu.nn.transformer import (
    apply_layer,
    causal_mask,
    rope_cos_sin,
    _norm,
)
from audiocodecs_tpu.downstream.models.multihead import multihead_logits
from audiocodecs_tpu.downstream.models.llama import llama_embed

__all__ = [
    "stack_pipeline_stages",
    "unstack_pipeline_stages",
    "shard_pp_llama_params",
    "make_pp_slm_loss",
    "make_pp_slm_train_step",
]


def stack_pipeline_stages(params: dict, num_stages: int) -> dict:
    """``init_llama_params`` output → pipeline form.

    The per-layer param dicts (a list) are stacked leaf-wise into arrays
    with leading ``[S, L/S]`` axes under ``body.stages``; everything else is
    carried over unchanged.
    """
    layers = params["body"]["layers"]
    L = len(layers)
    if L % num_stages:
        raise ValueError(f"{L} layers not divisible into {num_stages} stages")
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    stacked = jax.tree.map(
        lambda x: x.reshape((num_stages, L // num_stages) + x.shape[1:]),
        stacked)
    return {
        "body": {
            "stages": stacked,
            "final_norm": params["body"]["final_norm"],
        },
        "embedding": params["embedding"],
        "head": params["head"],
    }


def unstack_pipeline_stages(pp_params: dict) -> dict:
    """Inverse of :func:`stack_pipeline_stages`: stage-stacked params back to
    the per-layer-list form ``llama_forward``/``llama_generate`` consume
    (used by recipes to run eval/generation after pipeline training)."""
    stages = pp_params["body"]["stages"]
    lead = jax.tree.leaves(stages)[0]
    S, Ls = int(lead.shape[0]), int(lead.shape[1])
    flat = jax.tree.map(lambda x: jnp.reshape(jnp.asarray(x),
                                              (S * Ls,) + x.shape[2:]),
                        stages)
    layers = [jax.tree.map(lambda x: x[i], flat) for i in range(S * Ls)]
    return {
        "body": {
            "layers": layers,
            "final_norm": pp_params["body"]["final_norm"],
        },
        "embedding": pp_params["embedding"],
        "head": pp_params["head"],
    }


def shard_pp_llama_params(pp_params: dict, mesh: Mesh,
                          axis: str = "model") -> dict:
    """Place stage-stacked leaves on the pipeline axis (each device holds
    one stage), everything else replicated. The stage count must equal the
    pipeline axis size — anything else would silently split the stack and
    skip layers inside the schedule."""

    S = mesh.shape[axis]

    def place_stage(leaf):
        if leaf.shape[0] != S:
            raise ValueError(
                f"stage stack has {leaf.shape[0]} stages but mesh axis "
                f"{axis!r} has {S} devices — re-run stack_pipeline_stages "
                f"with num_stages={S}")
        return jax.device_put(jnp.asarray(leaf),
                              NamedSharding(mesh, P(axis)))

    def place_rep(leaf):
        return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, P()))

    out = jax.tree.map(place_rep, pp_params)
    out["body"]["stages"] = jax.tree.map(place_stage,
                                         pp_params["body"]["stages"])
    return out


def make_pp_slm_loss(lcfg, mesh: Mesh, num_microbatches: int,
                     axis: str = "model"):
    """Pipeline-parallel SLM loss ``(pp_params, flat, mask) -> scalar``.

    Same objective as :func:`audiocodecs_tpu.parallel.train.make_slm_train_step`
    (K-interleaved next-token CE), with the transformer depth executed as a
    ``S``-stage, ``num_microbatches``-deep GPipe schedule on ``axis``.
    Batch must divide ``num_microbatches × mesh.shape['data']``.
    """
    tcfg = lcfg.transformer()
    S = mesh.shape[axis]
    M = num_microbatches
    K, C = lcfg.num_codebooks, lcfg.vocab_size

    layer = (jax.checkpoint(apply_layer, static_argnums=(2,))
             if tcfg.remat else apply_layer)

    def stage_apply(stage_layers, x, cos, sin, mask):
        def body(h, lp):
            return layer(h, lp, tcfg, cos, sin, mask), None
        x, _ = lax.scan(body, x, stage_layers)
        return x

    def pipeline_fn(stage_layers, embs_mb):
        # In shard_map: stage_layers leaves [1, L/S, ...] (this device's
        # stage); embs_mb [M, mb_local, T, D].
        stage_layers = jax.tree.map(lambda x: x[0], stage_layers)
        idx = lax.axis_index(axis)
        T = embs_mb.shape[2]
        cos, sin = rope_cos_sin(jnp.arange(T), tcfg.head_dim, tcfg.rope_theta)
        mask = causal_mask(T, T, tcfg.sliding_window)[None, None, None]
        perm = [(i, (i + 1) % S) for i in range(S)]
        state = jnp.zeros_like(embs_mb[0])
        outs = jnp.zeros_like(embs_mb)
        for t in range(M + S - 1):
            inject = embs_mb[min(t, M - 1)]
            state = jnp.where(idx == 0, inject, state)
            state = stage_apply(stage_layers, state, cos, sin, mask)
            o = t - (S - 1)
            if o >= 0:
                outs = outs.at[o].set(
                    jnp.where(idx == S - 1, state, outs[o]))
            if t < M + S - 2:
                state = lax.ppermute(state, axis, perm)
        # only the last stage holds real outputs — broadcast over the ring
        outs = lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), axis)
        return outs

    def run_pipeline(pp_params, embs):
        stages = jax.tree.leaves(pp_params["body"]["stages"])[0].shape[0]
        if stages != S:
            raise ValueError(
                f"param stack has {stages} stages, mesh axis {axis!r} "
                f"has {S}")
        B, L, D = embs.shape
        mb = B // M
        embs_mb = embs.reshape(M, mb, L, D)
        outs = jax.shard_map(
            pipeline_fn,
            mesh=mesh,
            in_specs=(jax.tree.map(lambda _: P(axis),
                                   pp_params["body"]["stages"]),
                      P(None, "data", None, None)),
            out_specs=P(None, "data", None, None),
            check_vma=False,
        )(pp_params["body"]["stages"], embs_mb)
        return outs.reshape(B, L, D)

    def loss_fn(pp_params, flat, mask):
        from audiocodecs_tpu.parallel.train import slm_interleaved_ce

        embs = llama_embed(pp_params, flat, lcfg)
        h = run_pipeline(pp_params, embs)
        h = _norm(h, pp_params["body"]["final_norm"], tcfg.norm,
                  tcfg.norm_eps)
        logits = multihead_logits(pp_params["head"], h,
                                  num_heads=lcfg.num_codebooks)
        return slm_interleaved_ce(logits, flat, mask, K, C)

    return loss_fn


def make_pp_slm_train_step(lcfg, optimizer: optax.GradientTransformation,
                           mesh: Mesh, num_microbatches: int,
                           axis: str = "model"):
    """Jittable pipeline-parallel SLM training step over
    :func:`make_pp_slm_loss` (kept for the multichip dryrun and tests)."""
    loss_fn = make_pp_slm_loss(lcfg, mesh, num_microbatches, axis)

    def step(pp_params, opt_state, flat, mask):
        loss, grads = jax.value_and_grad(loss_fn)(pp_params, flat, mask)
        updates, opt_state = optimizer.update(grads, opt_state, pp_params)
        pp_params = optax.apply_updates(pp_params, updates)
        return pp_params, opt_state, loss

    return step, loss_fn
