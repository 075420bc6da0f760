"""Expert parallelism: EP forward == dense reference, training works."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from audiocodecs_tpu.parallel.mesh import make_mesh
from audiocodecs_tpu.parallel.moe import (
    MoEConfig,
    init_moe_params,
    make_moe_train_step,
    moe_ffn_dense,
    shard_moe_params,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    cfg = MoEConfig(hidden_size=16, ffn_size=32, num_experts=4,
                    capacity_factor=4.0)
    params = init_moe_params(jax.random.PRNGKey(0), cfg)
    return mesh, cfg, params


def test_ep_matches_per_shard_dense(setup):
    mesh, cfg, params = setup
    data = mesh.shape["data"]
    rng = np.random.default_rng(0)
    N = 8 * data
    x = jnp.asarray(rng.standard_normal((N, cfg.hidden_size)), jnp.float32)

    # dense reference applied per data shard (routing/capacity are local
    # to each shard, matching the sharded layer's semantics)
    chunks = [moe_ffn_dense(params, c, cfg)
              for c in jnp.split(x, data, axis=0)]
    want = jnp.concatenate(chunks, axis=0)

    sp = shard_moe_params(params, mesh)
    _, _, forward = make_moe_train_step(cfg, optax.adam(1e-3), mesh)
    with jax.set_mesh(mesh):
        got = forward(sp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
    assert np.isfinite(np.asarray(got)).all()
    assert float(jnp.abs(got).max()) > 0  # experts actually fired


def test_ep_train_step_decreases_loss(setup):
    mesh, cfg, params = setup
    rng = np.random.default_rng(1)
    N = 8 * mesh.shape["data"]
    x = jnp.asarray(rng.standard_normal((N, cfg.hidden_size)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((N, cfg.hidden_size)), jnp.float32)
    sp = shard_moe_params(params, mesh)
    opt = optax.adam(1e-2)
    step, loss_fn, _ = make_moe_train_step(cfg, opt, mesh)
    with jax.set_mesh(mesh):
        st = opt.init(sp)
        l0 = float(loss_fn(sp, x, y))
        jstep = jax.jit(step)
        for _ in range(10):
            sp, st, loss = jstep(sp, st, x, y)
        l1 = float(loss_fn(sp, x, y))
    assert np.isfinite(l0) and np.isfinite(l1) and l1 < l0


def test_capacity_drops_are_graceful():
    cfg = MoEConfig(hidden_size=8, ffn_size=16, num_experts=4,
                    capacity_factor=0.25)  # capacity 1: most tokens dropped
    params = init_moe_params(jax.random.PRNGKey(2), cfg)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((16, 8)),
                    jnp.float32)
    out = moe_ffn_dense(params, x, cfg)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()
    # at most E * capacity tokens produce nonzero expert output
    nonzero = int((jnp.abs(out).sum(-1) > 1e-9).sum())
    assert nonzero <= cfg.num_experts * cfg.capacity(16)


def test_experts_divisibility_check():
    mesh = make_mesh(8, model_parallel=2)
    cfg = MoEConfig(num_experts=3)
    with pytest.raises(ValueError):
        make_moe_train_step(cfg, optax.adam(1e-3), mesh)


def test_moe_llama_decoder_forward_and_grad():
    """LlamaConfig.moe_experts > 0 swaps every layer's SwiGLU MLP for the
    switch-MoE FFN: forward shapes hold, loss is finite, and gradients
    flow to every expert leaf (router, w_in, w_out)."""
    from audiocodecs_tpu.downstream.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_embed,
        llama_forward,
    )

    lcfg = LlamaConfig(vocab_size=16, num_codebooks=2, hidden_size=16,
                       num_layers=2, num_heads=2, num_kv_heads=1,
                       intermediate_size=32, moe_experts=4,
                       moe_capacity_factor=4.0)
    params = init_llama_params(jax.random.PRNGKey(0), lcfg)
    layer0 = params["body"]["layers"][0]
    assert "moe" in layer0 and "mlp" not in layer0
    assert layer0["moe"]["w_in"].shape == (4, 16, 32)

    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, size=(2, 8)), jnp.int32)

    def loss(p):
        logits = llama_forward(p, llama_embed(p, toks, lcfg), lcfg)
        return jnp.mean(logits ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    g0 = grads["body"]["layers"][0]["moe"]
    for name in ("router", "w_in", "w_out"):
        assert float(jnp.abs(g0[name]).sum()) > 0.0, name


def test_moe_llama_generate_runs():
    """KV-cached generation routes single-step tokens through the MoE FFN."""
    from audiocodecs_tpu.downstream.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_generate,
    )

    lcfg = LlamaConfig(vocab_size=16, num_codebooks=2, hidden_size=16,
                       num_layers=2, num_heads=2, num_kv_heads=1,
                       intermediate_size=32, moe_experts=2,
                       moe_capacity_factor=4.0)
    params = init_llama_params(jax.random.PRNGKey(0), lcfg)
    prompt = jnp.asarray([[lcfg.bos_token, 0, 1]], jnp.int32)
    toks, _ = llama_generate(params, lcfg, prompt, 4,
                             jax.random.PRNGKey(1), top_p=0.0)
    assert toks.shape == (1, 4)


def test_aux_loss_balance_signal():
    """Switch aux loss (E·Σ f_e·P_e): ≈1 at perfect balance, grows toward
    E under collapse — the gradient signal that spreads routing."""
    from audiocodecs_tpu.parallel.moe import moe_ffn_dense_aux

    cfg = MoEConfig(hidden_size=8, ffn_size=16, num_experts=4,
                    capacity_factor=4.0)
    params = init_moe_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    # zero router → uniform probs; argmax ties break to expert 0, so force
    # balance by constructing logits that rotate the winner
    balanced = dict(params, router=jnp.zeros((8, 4)))
    eye = jnp.tile(jnp.eye(4), (4, 1))  # 16 tokens, winners 0,1,2,3,...
    x_bal = jnp.concatenate([eye * 3.0, jnp.zeros((16, 4))], axis=1)
    ident = dict(params, router=jnp.concatenate(
        [jnp.eye(4) * 1.0, jnp.zeros((4, 4))], axis=0))
    _, aux_bal = moe_ffn_dense_aux(ident, x_bal, cfg)
    # collapse: huge bias on expert 0 for every token
    collapse = dict(params, router=jnp.concatenate(
        [jnp.full((1, 4), 0.0) + jnp.asarray([[50.0, 0, 0, 0]]),
         jnp.zeros((7, 4))], axis=0))
    x = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    x = x.at[:, 0].set(1.0)  # constant bias feature drives router col 0
    _, aux_col = moe_ffn_dense_aux(collapse, x, cfg)

    assert float(aux_bal) < 1.8  # near-balanced
    assert float(aux_col) > 3.0  # near-collapsed (max = E = 4)
    assert float(aux_col) > float(aux_bal)

    # differentiable: router receives a balancing gradient
    g = jax.grad(lambda p: moe_ffn_dense_aux(p, x, cfg)[1])(collapse)
    assert float(jnp.abs(g["router"]).sum()) > 0.0


def test_top2_routing_combines_two_experts():
    """top_k=2 with ample capacity: every token's output is the
    renormalized-gate-weighted sum of its two best experts (computed
    manually against the per-expert MLPs)."""
    from audiocodecs_tpu.parallel.moe import moe_ffn_dense_aux

    cfg1 = MoEConfig(hidden_size=8, ffn_size=16, num_experts=4,
                     capacity_factor=8.0, top_k=1)
    cfg2 = MoEConfig(hidden_size=8, ffn_size=16, num_experts=4,
                     capacity_factor=8.0, top_k=2)
    params = init_moe_params(jax.random.PRNGKey(1), cfg1)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((6, 8)), jnp.float32)

    out2, _ = moe_ffn_dense_aux(params, x, cfg2)

    probs = jax.nn.softmax(x @ params["router"], axis=-1)
    gates, experts = jax.lax.top_k(probs, 2)
    gates = gates / gates.sum(-1, keepdims=True)

    def expert(e, v):
        u = jax.nn.gelu(v @ params["w_in"][e], approximate=False)
        return u @ params["w_out"][e]

    want = jnp.stack([
        gates[n, 0] * expert(int(experts[n, 0]), x[n])
        + gates[n, 1] * expert(int(experts[n, 1]), x[n])
        for n in range(6)])
    np.testing.assert_allclose(np.asarray(out2), np.asarray(want),
                               atol=1e-5, rtol=1e-5)

    # top-1 keeps the RAW gate (Switch semantics — back-compat): output is
    # p_max · best-expert(x), strictly smaller than the expert output
    out1, _ = moe_ffn_dense_aux(params, x, cfg1)
    want1 = jnp.stack([
        probs[n, int(experts[n, 0])] * expert(int(experts[n, 0]), x[n])
        for n in range(6)])
    np.testing.assert_allclose(np.asarray(out1), np.asarray(want1),
                               atol=1e-5, rtol=1e-5)


def test_ep_matches_dense_top2(setup):
    """EP forward == per-shard dense reference under top-2 routing too."""
    mesh, _, params = setup
    cfg = MoEConfig(hidden_size=16, ffn_size=32, num_experts=4,
                    capacity_factor=4.0, top_k=2)
    data = mesh.shape["data"]
    rng = np.random.default_rng(7)
    N = 8 * data
    x = jnp.asarray(rng.standard_normal((N, cfg.hidden_size)), jnp.float32)
    chunks = [moe_ffn_dense(params, c, cfg)
              for c in jnp.split(x, data, axis=0)]
    want = jnp.concatenate(chunks, axis=0)
    sp = shard_moe_params(params, mesh)
    _, _, forward = make_moe_train_step(cfg, optax.adam(1e-3), mesh)
    with jax.set_mesh(mesh):
        got = forward(sp, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_moe_llama_aux_plumbing():
    """llama_forward(return_aux=True) surfaces a positive, differentiable
    aux for MoE configs and exactly zero for dense ones; default-off
    weight keeps existing losses bit-identical."""
    from audiocodecs_tpu.downstream.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_embed,
        llama_forward,
    )

    toks = jnp.asarray(
        np.random.default_rng(0).integers(0, 16, size=(2, 8)), jnp.int32)

    lcfg = LlamaConfig(vocab_size=16, num_codebooks=2, hidden_size=16,
                       num_layers=2, num_heads=2, num_kv_heads=1,
                       intermediate_size=32, moe_experts=4,
                       moe_capacity_factor=4.0, moe_top_k=2,
                       moe_aux_weight=1e-2)
    params = init_llama_params(jax.random.PRNGKey(0), lcfg)
    embs = llama_embed(params, toks, lcfg)
    logits, aux = llama_forward(params, embs, lcfg, return_aux=True)
    # head vocab = C + num_special (EOS/BOS/pad rows)
    assert logits.shape == (2, 8, 2, 16 + lcfg.num_special)
    assert float(aux) > 0.0
    # aux path does not perturb the logits
    np.testing.assert_array_equal(
        np.asarray(logits), np.asarray(llama_forward(params, embs, lcfg)))

    dense = LlamaConfig(vocab_size=16, num_codebooks=2, hidden_size=16,
                        num_layers=2, num_heads=2, num_kv_heads=1,
                        intermediate_size=32)
    dparams = init_llama_params(jax.random.PRNGKey(0), dense)
    dembs = llama_embed(dparams, toks, dense)
    _, daux = llama_forward(dparams, dembs, dense, return_aux=True)
    assert float(daux) == 0.0
