"""Pallas fused-LSTM kernel parity (interpret mode on CPU; the compiled
path is exercised on TPU by bench/e2e runs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.lstm import init_lstm_params, lstm
from audiocodecs_tpu.ops.lstm_pallas import lstm_layer_pallas


@pytest.mark.parametrize("T,chunk", [(16, 8), (23, 8), (5, 16)])
def test_matches_scan(rng, T, chunk):
    B, H = 4, 32
    p = init_lstm_params(jax.random.PRNGKey(0), 1, H, H)[0]
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    ref, state = lstm(x, [p])
    h_ref, c_ref = state[0]

    gates_x = jnp.swapaxes(
        jnp.einsum("bth,hg->btg", x, p["w_ih"]) + p["b"], 0, 1
    )
    ys, h, c = lstm_layer_pallas(
        gates_x, p["w_hh"], jnp.zeros((B, H)), jnp.zeros((B, H)),
        chunk=chunk, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ys, 0, 1)),
                               np.asarray(ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), atol=1e-6)


def test_wide_layer_matches_scan(rng):
    """H=1536 (BigCodec width): the raised-vmem_limit path must keep
    parity (interpret mode ignores compiler params — this pins shapes
    and the footprint arithmetic, the compiled path is measured on TPU)."""
    B, H, T = 2, 1536, 6
    p = init_lstm_params(jax.random.PRNGKey(1), 1, H, H)[0]
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32) * 0.1)
    ref, _ = lstm(x, [p])
    gates_x = jnp.swapaxes(
        jnp.einsum("bth,hg->btg", x, p["w_ih"]) + p["b"], 0, 1
    )
    ys, _, _ = lstm_layer_pallas(
        gates_x, p["w_hh"], jnp.zeros((B, H)), jnp.zeros((B, H)),
        chunk=4, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ys, 0, 1)),
                               np.asarray(ref), atol=2e-5)


def test_gradients_match_scan(rng):
    """The kernel's custom VJP (scan-recompute backward) must produce the
    scan path's gradients — this is what keeps trainable LSTM probes
    (downstream classification/SE heads) working on real TPUs where the
    fused kernel is enabled by default. Regression for the round-5
    NotImplementedError: pallas_call has no autodiff rule of its own."""
    B, H, T = 2, 32, 7
    p = init_lstm_params(jax.random.PRNGKey(2), 1, H, H)[0]
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    gates_x = jnp.swapaxes(
        jnp.einsum("bth,hg->btg", x, p["w_ih"]) + p["b"], 0, 1
    )
    h0 = c0 = jnp.zeros((B, H))

    def loss_pallas(gx, w_hh):
        ys, h, c = lstm_layer_pallas(gx, w_hh, h0, c0, chunk=4,
                                     interpret=True)
        return jnp.sum(ys ** 2) + jnp.sum(h * c)

    def loss_scan(gx, w_hh):
        from audiocodecs_tpu.ops.lstm_pallas import _scan_reference

        ys, h, c = _scan_reference(gx, w_hh, h0, c0)
        return jnp.sum(ys ** 2) + jnp.sum(h * c)

    g_pallas = jax.grad(loss_pallas, argnums=(0, 1))(gates_x, p["w_hh"])
    g_scan = jax.grad(loss_scan, argnums=(0, 1))(gates_x, p["w_hh"])
    for a, b in zip(g_pallas, g_scan):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_nonzero_initial_state(rng):
    B, H, T = 2, 32, 9
    p = init_lstm_params(jax.random.PRNGKey(1), 1, H, H)[0]
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    h0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    c0 = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    ref, _ = lstm(x, [p], state=[(h0, c0)])
    gates_x = jnp.swapaxes(
        jnp.einsum("bth,hg->btg", x, p["w_ih"]) + p["b"], 0, 1
    )
    ys, _, _ = lstm_layer_pallas(gates_x, p["w_hh"], h0, c0, chunk=4,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.swapaxes(ys, 0, 1)),
                               np.asarray(ref), atol=1e-6)
