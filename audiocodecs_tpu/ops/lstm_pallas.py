"""Fused LSTM recurrence as a Pallas TPU kernel.

The EnCodec-family bottleneck LSTM dominates codec latency under XLA: a
``lax.scan`` pays per-step loop overhead and re-reads ``w_hh`` from HBM every
step. This kernel runs the whole recurrence in ONE pallas_call:

  * the recurrent weights ``w_hh`` (all layers' gates) stay resident in VMEM
    for the entire sequence;
  * the carry ``(h, c)`` lives in VMEM scratch, which on TPU persists across
    sequential grid iterations — the grid walks time-chunks in order while
    Pallas double-buffers the ``gates_x`` input DMA and the ``y`` output DMA
    around the compute;
  * each step is one ``[B, H] @ [H, 4H]`` MXU matmul plus VPU gate math.

The input projection (``x @ w_ih + b`` for all timesteps) is NOT in the
kernel — it is one large batched matmul that XLA already handles at peak.

Numerics match :func:`audiocodecs_tpu.nn.lstm.lstm` (PyTorch gate order
i,f,g,o) to float32 round-off; parity is enforced by tests in interpret mode
on CPU and compiled mode on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_layer_pallas"]


def _kernel(seq_len_ref, gx_ref, whh_ref, h0_ref, c0_ref, y_ref, hout_ref,
            cout_ref, h_scr, c_scr, *, chunk: int):
    step0 = pl.program_id(0) * chunk
    seq_len = seq_len_ref[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        h_scr[:] = h0_ref[:]
        c_scr[:] = c0_ref[:]

    H = h_scr.shape[-1]

    def step(i, _):
        @pl.when(step0 + i < seq_len)
        def _():
            gates = gx_ref[i] + jnp.dot(
                h_scr[:], whh_ref[:], preferred_element_type=jnp.float32
            )
            gi = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
            gf = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
            gg = jnp.tanh(gates[:, 2 * H : 3 * H])
            go = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
            c = gf * c_scr[:] + gi * gg
            h = go * jnp.tanh(c)
            h_scr[:] = h
            c_scr[:] = c
            y_ref[i] = h
        return 0

    jax.lax.fori_loop(0, chunk, step, 0)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _finish():
        hout_ref[:] = h_scr[:]
        cout_ref[:] = c_scr[:]


def _scan_reference(gates_x: jax.Array, w_hh: jax.Array, h0: jax.Array,
                    c0: jax.Array):
    """Pure-XLA recurrence with the kernel's exact math (time-major).

    Used as the differentiation rule for the fused kernel: pallas_call has
    no JVP/VJP, so without this every *trainable* LSTM (the downstream
    classification/SE probes) would crash on real TPUs where the kernel
    gate (`nn/lstm._pallas_enabled`) is on by default."""
    H = w_hh.shape[0]

    def step(carry, gx):
        h, c = carry
        gates = gx + jnp.dot(h, w_hh, preferred_element_type=jnp.float32)
        gi = jax.nn.sigmoid(gates[:, 0 * H : 1 * H])
        gf = jax.nn.sigmoid(gates[:, 1 * H : 2 * H])
        gg = jnp.tanh(gates[:, 2 * H : 3 * H])
        go = jax.nn.sigmoid(gates[:, 3 * H : 4 * H])
        c = gf * c + gi * gg
        h = go * jnp.tanh(c)
        return (h, c), h

    (h_t, c_t), ys = jax.lax.scan(step, (h0, c0), gates_x)
    return ys, h_t, c_t


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _recurrence(chunk: int, interpret: bool, gates_x, w_hh, h0, c0):
    return _pallas_impl(gates_x, w_hh, h0, c0, chunk=chunk,
                        interpret=interpret)


def _recurrence_fwd(chunk, interpret, gates_x, w_hh, h0, c0):
    out = _recurrence(chunk, interpret, gates_x, w_hh, h0, c0)
    return out, (gates_x, w_hh, h0, c0)


def _recurrence_bwd(chunk, interpret, residuals, cotangents):
    # Recompute-through-scan backward: the kernel and the scan compute the
    # same function to f32 round-off, so the scan's VJP is the kernel's.
    # Costs one extra forward (like jax.checkpoint) only when training.
    del chunk, interpret
    _, vjp = jax.vjp(_scan_reference, *residuals)
    return vjp(cotangents)


_recurrence.defvjp(_recurrence_fwd, _recurrence_bwd)


@functools.partial(jax.jit, static_argnames=("chunk", "interpret"))
def lstm_layer_pallas(gates_x: jax.Array, w_hh: jax.Array, h0: jax.Array,
                      c0: jax.Array, *, chunk: int | None = None,
                      interpret: bool = False):
    """Run one LSTM layer's recurrence.

    ``gates_x``: [T, B, 4H] (input projection + biases, time-major);
    ``w_hh``: [H, 4H]; ``h0``/``c0``: [B, H].
    Returns (ys [T, B, H], h_T, c_T).

    Differentiable: the fused kernel carries a custom VJP that recomputes
    the backward pass through :func:`_scan_reference` (pallas_call itself
    has no autodiff rule), so trainable LSTMs can keep the fast forward.

    Wide layers (H > 768, e.g. BigCodec's H=1536 whose resident w_hh is
    37.7 MB) exceed Mosaic's 16 MB default scoped-VMEM budget; for those
    the call raises ``vmem_limit_bytes`` to the actual block footprint —
    v5e has 128 MB of physical VMEM, the 16 MB default is just the
    compiler's conservative cap (measured: the H=1536 kernel compiles and
    runs, BENCH_NOTES round 5).
    """
    _, B, H4 = gates_x.shape
    if chunk is None:
        # chunk·B·4H f32 is double-buffered in VMEM alongside w_hh and the
        # [chunk, B, H] output; budget ~1M elements per input block.
        chunk = max(1, min(16, (1 << 20) // (B * H4)))
    return _recurrence(chunk, interpret, gates_x, w_hh, h0, c0)


def _pallas_impl(gates_x: jax.Array, w_hh: jax.Array, h0: jax.Array,
                 c0: jax.Array, *, chunk: int, interpret: bool):
    T, B, H4 = gates_x.shape
    H = H4 // 4
    n_chunks = pl.cdiv(T, chunk)
    # resident footprint: w_hh + double-buffered gx/y blocks + carries
    vmem_bytes = 4 * (H * H4 + 2 * chunk * B * H4 + 2 * chunk * B * H
                      + 6 * B * H)
    compiler_params = None
    if vmem_bytes > 15 << 20:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_bytes * 1.25))
    T_pad = n_chunks * chunk
    if T_pad != T:
        gates_x = jnp.pad(gates_x, ((0, T_pad - T), (0, 0), (0, 0)))
    seq_len = jnp.asarray([T], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, B, H4), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((H, H4), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk, B, H), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, H), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
    )
    kwargs = {}
    if compiler_params is not None and not interpret:
        kwargs["compiler_params"] = compiler_params
    ys, h_t, c_t = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk),
        out_shape=[
            jax.ShapeDtypeStruct((T_pad, B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
            jax.ShapeDtypeStruct((B, H), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        **kwargs,
    )(seq_len, gates_x, w_hh, h0, c0)
    return ys[:T], h_t, c_t
