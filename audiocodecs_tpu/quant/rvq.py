"""Residual vector quantization (RVQ).

Semantics match the reference codecs' residual quantizers (EnCodec/DAC/
SpeechTokenizer/Mimi wrappers — e.g. reference ``encodec.py:76-79``,
``dac.py:75-91``): K sequential codebook stages, each quantizing the residual
of the previous stages. The stage loop is a Python loop over K (static, ≤ 32)
so XLA sees one fused graph of K matmuls; each stage may have input/output
projections (DAC-style low-dim codebooks).

Codebook pytree layout::

    {"codebooks": [K, C, H]}                          # shared-dim RVQ
    {"codebooks": ..., "in_proj": [K, H, D], ...}     # projected RVQ (DAC)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from audiocodecs_tpu.quant.vq import vq_decode, vq_encode

__all__ = ["rvq_encode", "rvq_decode", "rvq_quantize", "rvq_quantize_stats"]


def rvq_encode(x: jax.Array, codebooks: jax.Array, num_codebooks: int | None = None):
    """``x``: [B, N, H], ``codebooks``: [K, C, H] → tokens [B, N, K]."""
    K = codebooks.shape[0] if num_codebooks is None else num_codebooks
    residual = x
    toks = []
    for k in range(K):
        idx = vq_encode(residual, codebooks[k])
        toks.append(idx)
        residual = residual - vq_decode(idx, codebooks[k])
    return jnp.stack(toks, axis=-1)


def rvq_decode(toks: jax.Array, codebooks: jax.Array) -> jax.Array:
    """Tokens [B, N, K] → quantized features [B, N, H].

    All K stages resolve through a single gather into the flattened
    ``[K·C, H]`` codebook table (per-stage index offsets), then one reduction
    over K — no sequential dependency, one HBM pass.
    """
    K, C, H = codebooks.shape
    K_used = toks.shape[-1]
    flat = codebooks.reshape(K * C, H)
    offsets = jnp.arange(K_used, dtype=toks.dtype) * C
    gathered = jnp.take(flat, toks + offsets, axis=0)  # [B, N, K_used, H]
    return jnp.sum(gathered, axis=-2)


def rvq_quantize(x: jax.Array, codebooks: jax.Array, num_codebooks: int | None = None):
    """Encode + straight-through decode in one pass → (toks, qfeats)."""
    K = codebooks.shape[0] if num_codebooks is None else num_codebooks
    residual = x
    q = jnp.zeros_like(x)
    toks = []
    for k in range(K):
        idx = vq_encode(residual, codebooks[k])
        stage = vq_decode(idx, codebooks[k])
        toks.append(idx)
        residual = residual - stage
        q = q + stage
    return jnp.stack(toks, axis=-1), q


def rvq_quantize_stats(x: jax.Array, codebooks: jax.Array,
                       num_codebooks: int | None = None):
    """Training-time quantize with EMA statistics.

    Like :func:`rvq_quantize` but additionally returns, per stage, the
    one-hot assignment counts and the sum of assigned stage-input residual
    vectors — the sufficient statistics for exponential-moving-average
    codebook updates (the EuclideanCodebook training rule EnCodec-lineage
    codecs use; the reference only ships frozen codecs, so this path has no
    counterpart there). Also returns the stacked per-stage residual inputs
    for dead-code restarts.

    Returns ``(toks [B,N,K], q [B,N,H], counts [K,C], sums [K,C,H],
    residuals [K,B·N,H])``. Statistics are computed on stop-gradient
    residuals; the counts/sums reductions are MXU matmuls
    (``[C,B·N] @ [B·N,H]``), not scatters.
    """
    K = codebooks.shape[0] if num_codebooks is None else num_codebooks
    C = codebooks.shape[1]
    residual = x
    q = jnp.zeros_like(x)
    toks, counts, sums, res_stack = [], [], [], []
    for k in range(K):
        idx = vq_encode(residual, codebooks[k])
        r = jax.lax.stop_gradient(residual)
        onehot = jax.nn.one_hot(idx, C, dtype=x.dtype)  # [B, N, C]
        counts.append(jnp.sum(onehot, axis=(0, 1)))
        sums.append(jnp.einsum("bnc,bnh->ch", onehot, r))
        res_stack.append(r.reshape(-1, r.shape[-1]))
        stage = vq_decode(idx, codebooks[k])
        toks.append(idx)
        residual = residual - stage
        q = q + stage
    return (jnp.stack(toks, axis=-1), q, jnp.stack(counts),
            jnp.stack(sums), jnp.stack(res_stack))
