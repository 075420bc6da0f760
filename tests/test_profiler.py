"""Profiler surface: FLOPs from XLA cost analysis, two independent latency
methods, compile-time memory analysis + live peak device memory field
(reference profiler cross-checks: ``profiler.py:138-200``)."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.quick


def test_profile_fn_fields_and_latency_agreement():
    from audiocodecs_tpu.downstream.profiler import profile_fn

    w = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((128, 128)).astype(np.float32))
    x = jnp.ones((64, 128), jnp.float32)

    r = profile_fn(lambda a, b: jnp.tanh(a @ b.T), (x, w), runs=4, warmups=2)

    for key in ("time_s", "time_min_s", "time_pipelined_s", "gflops",
                "gmacs", "bytes_accessed_gb", "memory"):
        assert key in r, key
    assert r["time_s"] > 0 and r["time_pipelined_s"] > 0
    # two independent methods must agree within an order of magnitude
    # (pipelined span amortizes dispatch, so it may be much smaller but
    # never wildly larger)
    assert r["time_pipelined_s"] < 20 * r["time_s"]
    # 64x128x128 matmul = 2*64*128*128 FLOPs ≈ 0.0021 GFLOPs; cost analysis
    # counts the tanh too, so allow headroom but pin the magnitude
    assert 0.001 < r["gflops"] < 0.1
    assert abs(r["gmacs"] - r["gflops"] / 2) < 1e-9
    # peak_bytes_in_use is backend-dependent: int on TPU, None on forced-CPU
    peak = r["memory"]["peak_bytes_in_use"]
    assert peak is None or (isinstance(peak, int) and peak > 0)


def test_profile_codec_sweep_shape():
    import jax

    from audiocodecs_tpu.downstream.profiler import (
        format_report,
        profile_codec,
    )
    from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig

    cfg = EncodecModelConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=32, codebook_dim=16,
        num_quantizers=2,
    )
    codec = Encodec(800, 800, num_codebooks=2, model_config=cfg,
                    key=jax.random.PRNGKey(0))
    res = profile_codec(codec, seconds=(1,), runs=2, warmups=1)
    assert "1s" in res and res["1s"]["rtf"] > 0
    assert "time_pipelined_s" in res["1s"]
    assert "params_m" in res
    report = format_report(res)
    assert "RTF" in report and "params" in report
