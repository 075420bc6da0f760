"""Tensor-parallel *inference* exactness: a codec with TP-sharded params
must produce bit-identical tokens and waveforms to the unsharded run.

Training-side TP is covered by the recipe tests (same loss as unsharded);
this pins the serving path — ``sig_to_toks``/``toks_to_sig`` with
``shard_codec_params`` placements under a ``(data, model)`` mesh. Tokens
must match EXACTLY (vq argmax margins at f32 HIGHEST dwarf the sharding
noise). Waveforms match to float-accumulation-order tolerance: each layer
shards its OUTPUT channels, so the next layer contracts over a sharded
Cin and GSPMD may pick partial-sums + all-reduce, which reorders f32
adds (measured ~2e-7 relative on the tiny config). The reference has no
counterpart (single-GPU torch wrappers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig
from audiocodecs_tpu.parallel.mesh import make_mesh
from audiocodecs_tpu.parallel.train import shard_codec_params

SR = 800


def tiny_codec(key=0):
    cfg = EncodecModelConfig(
        sampling_rate=SR, num_filters=8, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=64, codebook_dim=16,
        num_quantizers=4,
    )
    return Encodec(SR, SR, model_config=cfg, num_codebooks=4,
                   key=jax.random.PRNGKey(key))


@pytest.mark.parametrize("mp", [2, 4])
def test_tp_sharded_inference_matches_unsharded(mp):
    if jax.device_count() < mp * 2:
        pytest.skip(f"needs {mp * 2} devices")
    codec = tiny_codec()
    sig = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, SR)).astype(np.float32)
        * 0.1)

    toks_ref = codec.sig_to_toks(sig)
    rec_ref = codec.toks_to_sig(toks_ref)

    mesh = make_mesh(model_parallel=mp, backend="cpu")
    sharded = shard_codec_params(codec.params, mesh)
    # At least one leaf must actually be sharded for the test to mean
    # anything.
    n_sharded = sum(
        not leaf.sharding.is_fully_replicated
        for leaf in jax.tree_util.tree_leaves(sharded)
        if hasattr(leaf, "sharding"))
    assert n_sharded > 0, "no leaf got a model-parallel sharding"

    with jax.set_mesh(mesh):
        toks_tp = codec._jitted("_sig_to_toks")(sharded, sig, None)
        rec_tp = codec._jitted("_toks_to_sig")(sharded, toks_tp, None)

    np.testing.assert_array_equal(np.asarray(toks_tp), np.asarray(toks_ref))
    scale = float(np.abs(np.asarray(rec_ref)).max())
    np.testing.assert_allclose(np.asarray(rec_tp), np.asarray(rec_ref),
                               atol=1e-5 * max(scale, 1.0), rtol=0)


def test_dp_sharded_serving_matches_single_device():
    """Data-parallel serving (the deployment path: batch sharded on the
    ``data`` axis, params replicated) produces BIT-identical tokens and
    f32-close waveforms vs the single-device run. Batch sharding must not
    touch per-row math — any mismatch is a layout bug, not noise."""
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")
    from audiocodecs_tpu.parallel.mesh import replicated, shard_batch

    codec = tiny_codec()
    sig = (np.random.default_rng(1).standard_normal((16, SR))
           .astype(np.float32) * 0.1)

    toks_ref = np.asarray(codec.sig_to_toks(jnp.asarray(sig)))
    rec_ref = np.asarray(codec.toks_to_sig(jnp.asarray(toks_ref)))

    mesh = make_mesh(8, model_parallel=1, backend="cpu")
    with jax.set_mesh(mesh):
        params = jax.device_put(codec.params, replicated(mesh))
        sig_dp = shard_batch(mesh, sig)
        toks_dp = codec._jitted("_sig_to_toks")(params, sig_dp, None)
        assert not toks_dp.sharding.is_fully_replicated, (
            "batch output must stay sharded on the data axis")
        rec_dp = codec._jitted("_toks_to_sig")(params, toks_dp, None)

    np.testing.assert_array_equal(np.asarray(toks_dp), toks_ref)
    scale = max(float(np.abs(rec_ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(rec_dp), rec_ref,
                               atol=1e-5 * scale, rtol=0)
