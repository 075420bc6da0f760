"""Fused multi-codebook embedding / output-head layers.

Capability parity with the reference's ``MultiHeadEmbedding`` /
``MultiHeadLinear`` (reference ``downstream/models/multihead.py:28-94``): one
big ``[ΣC_k(+1), H]`` table with per-codebook index offsets so a ``[B, N, K]``
token grid embeds in a single gather, and one fused ``[H, ΣC_k]`` projection
producing per-codebook logits in a single MXU matmul.

``vocab_size`` may be one int (uniform codebooks) or a per-codebook sequence
(heterogeneous, reference ``multihead.py:37-43`` — e.g. SemantiCodec's
semantic/acoustic split, reference ``semanticodec.py:34-35,66``). With
heterogeneous vocabs the logits come back as a static-shape ``[..., K, Cmax]``
tensor with ``-1e9`` on the invalid tail of each codebook row, which flows
through softmax/CE/argmax unchanged — no ragged shapes under jit.
"""

from __future__ import annotations

from typing import Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "multihead_embed",
    "multihead_logits",
    "init_multihead_embedding",
    "init_multihead_linear",
    "fused_table_from_embs",
    "vocab_offsets",
]

VocabSpec = Union[int, Sequence[int]]


def _vocab_list(vocab_size: VocabSpec, num_codebooks: int) -> list[int]:
    if isinstance(vocab_size, (list, tuple)):
        if len(vocab_size) != num_codebooks:
            raise ValueError(
                f"{len(vocab_size)} vocab sizes for {num_codebooks} codebooks"
            )
        return [int(c) for c in vocab_size]
    return [int(vocab_size)] * num_codebooks


def vocab_offsets(vocab_size: VocabSpec, num_codebooks: int) -> np.ndarray:
    """Row offset of each codebook in the fused table: cumsum of sizes."""
    sizes = _vocab_list(vocab_size, num_codebooks)
    return np.concatenate([[0], np.cumsum(sizes[:-1])]).astype(np.int64)


def multihead_embed(params, toks: jax.Array, *, vocab_size: VocabSpec,
                    pad_token: int | None = None,
                    pad_is_vocab: bool = False) -> jax.Array:
    """``toks`` [..., K] → embeddings [..., K, H].

    Codebook k's token t reads row ``t + offset_k``. Padding: either a
    shared ``pad_token`` id, or (``pad_is_vocab``, the reference's
    ``padding_idx`` semantics) token ``C_k`` in codebook k — both map to the
    final table row.
    """
    K = toks.shape[-1]
    sizes = jnp.asarray(_vocab_list(vocab_size, K), dtype=toks.dtype)
    offsets = jnp.asarray(vocab_offsets(vocab_size, K), dtype=toks.dtype)
    idx = toks + offsets
    pad_row = params["table"].shape[0] - 1
    if pad_is_vocab:
        idx = jnp.where(toks == sizes, pad_row, idx)
    elif pad_token is not None:
        idx = jnp.where(toks == pad_token, pad_row, idx)
    return jnp.take(params["table"], idx, axis=0)


def multihead_logits(params, x: jax.Array, *, num_heads: int,
                     vocab_size: VocabSpec | None = None) -> jax.Array:
    """``x`` [..., H] → per-codebook logits via one fused matmul.

    Uniform vocabs → [..., K, C]. Heterogeneous → [..., K, Cmax] with
    ``-1e9`` past each codebook's true vocab.
    """
    y = jnp.einsum("...h,ho->...o", x, params["w"],
                   precision=lax.Precision.HIGHEST)
    if "b" in params:
        y = y + params["b"]
    if vocab_size is None or not isinstance(vocab_size, (list, tuple)):
        return y.reshape(*y.shape[:-1], num_heads, y.shape[-1] // num_heads)
    sizes = _vocab_list(vocab_size, num_heads)
    offs = vocab_offsets(vocab_size, num_heads)
    cmax = max(sizes)
    # large-negative (not -inf) padding: zero softmax mass, NaN-safe grads
    out = jnp.full((*y.shape[:-1], num_heads, cmax), -1e9, y.dtype)
    for k, (o, c) in enumerate(zip(offs, sizes)):
        out = out.at[..., k, :c].set(y[..., int(o) : int(o) + c])
    return out


def fused_table_from_embs(codec_embs, vocab_size: VocabSpec,
                          dim: int) -> np.ndarray:
    """Pretrain the fused table from codec codebooks ``[K, Cmax, H]``
    (reference ``train_asr.py:235-238``), truncating/zero-padding H → dim
    and dropping each codebook's padded tail under heterogeneous vocabs."""
    ce = np.asarray(codec_embs)
    sizes = _vocab_list(vocab_size, ce.shape[0])
    rows = np.concatenate([ce[k, :c] for k, c in enumerate(sizes)], axis=0)
    table = np.zeros((rows.shape[0], dim), np.float32)
    d = min(rows.shape[1], dim)
    table[:, :d] = rows[:, :d]
    return table


def init_multihead_embedding(key, num_codebooks: int, vocab_size: VocabSpec,
                             dim: int, pad_row: bool = False):
    rows = sum(_vocab_list(vocab_size, num_codebooks)) + (1 if pad_row else 0)
    return {"table": jax.random.normal(key, (rows, dim)) * 0.02}


def init_multihead_linear(key, dim: int, num_codebooks: int,
                          vocab_size: VocabSpec, bias: bool = True):
    out = sum(_vocab_list(vocab_size, num_codebooks))
    p = {"w": jax.random.normal(key, (dim, out)) * dim**-0.5}
    if bias:
        p["b"] = jnp.zeros((out,))
    return p
