"""Pipeline parallelism (GPipe over ppermute): exactness + training step.

The pipeline schedule must be a pure re-scheduling of the computation: the
pipelined loss must equal the plain single-program loss to float tolerance,
and a training step must run with finite loss on the virtual 8-device CPU
mesh (conftest forces ``--xla_force_host_platform_device_count=8``).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from audiocodecs_tpu.downstream.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_embed,
    llama_forward,
)
from audiocodecs_tpu.parallel.mesh import make_mesh
from audiocodecs_tpu.parallel.pipeline import (
    make_pp_slm_train_step,
    shard_pp_llama_params,
    stack_pipeline_stages,
)


@pytest.fixture(scope="module")
def setup():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, model_parallel=2)
    lcfg = LlamaConfig(
        vocab_size=16, num_codebooks=2, hidden_size=32, num_layers=4,
        num_heads=4, num_kv_heads=2, intermediate_size=64,
    )
    params = init_llama_params(jax.random.PRNGKey(0), lcfg)
    return mesh, lcfg, params


def _ref_loss(params, lcfg, flat, mask):
    K, C = lcfg.num_codebooks, lcfg.vocab_size
    logits = llama_forward(params, llama_embed(params, flat, lcfg), lcfg)
    L = flat.shape[1]
    cb = (jnp.arange(L - 1) % K).astype(jnp.int32)
    lg = jnp.take_along_axis(
        logits[:, :-1], cb[None, :, None, None], axis=2)[:, :, 0]
    tgt = flat[:, 1:]
    head_tgt = jnp.where(tgt >= K * C, C + (tgt - K * C), tgt)
    ce = optax.softmax_cross_entropy_with_integer_labels(lg, head_tgt)
    m = mask[:, 1:]
    return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)


def test_pipeline_matches_plain_forward(setup):
    mesh, lcfg, params = setup
    rng = np.random.default_rng(0)
    B, L = 16, 12  # microbatch (B/M = 4) must divide the data axis (4)
    flat = jnp.asarray(
        rng.integers(0, lcfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)

    want = float(_ref_loss(params, lcfg, flat, mask))
    assert np.isfinite(want)  # equal_nan guard: allclose treats nan==nan

    pp = stack_pipeline_stages(params, num_stages=2)
    pp = shard_pp_llama_params(pp, mesh)
    _, loss_fn = make_pp_slm_train_step(
        lcfg, optax.adam(1e-4), mesh, num_microbatches=4)
    with jax.set_mesh(mesh):
        got = float(jax.jit(loss_fn)(pp, flat, mask))
    np.testing.assert_allclose(got, want, rtol=2e-5)


def test_pipeline_train_step_runs(setup):
    mesh, lcfg, params = setup
    rng = np.random.default_rng(1)
    B, L = 8, 10
    flat = jnp.asarray(rng.integers(0, lcfg.vocab_size, (B, L)), jnp.int32)
    mask = jnp.ones((B, L), jnp.float32)

    pp = stack_pipeline_stages(params, num_stages=2)
    pp = shard_pp_llama_params(pp, mesh)
    opt = optax.adam(1e-3)
    step, loss_fn = make_pp_slm_train_step(lcfg, opt, mesh,
                                           num_microbatches=2)
    with jax.set_mesh(mesh):
        opt_state = opt.init(pp)
        jstep = jax.jit(step)
        l0 = float(loss_fn(pp, flat, mask))
        for _ in range(5):
            pp, opt_state, loss = jstep(pp, opt_state, flat, mask)
        l5 = float(loss_fn(pp, flat, mask))
    assert np.isfinite(l0) and np.isfinite(l5)
    assert l5 < l0  # the pipeline backward actually trains


def test_stage_stacking_roundtrip(setup):
    _, lcfg, params = setup
    pp = stack_pipeline_stages(params, num_stages=2)
    q = pp["body"]["stages"]["q"]["w"]
    assert q.shape[:2] == (2, lcfg.num_layers // 2)
    np.testing.assert_array_equal(
        np.asarray(q[0, 0]), np.asarray(params["body"]["layers"][0]["q"]["w"]))
    np.testing.assert_array_equal(
        np.asarray(q[1, 1]), np.asarray(params["body"]["layers"][3]["q"]["w"]))
    with pytest.raises(ValueError):
        stack_pipeline_stages(params, num_stages=3)
