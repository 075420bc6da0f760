"""The dynamic-batching serving loop serves correct-length, finite audio."""

import importlib.util
import os

import numpy as np

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_serve():
    spec = importlib.util.spec_from_file_location(
        "serve_example", os.path.join(REPO, "examples", "serve.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_codec_server_roundtrips():
    from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig

    serve = _load_serve()
    cfg = EncodecModelConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=32, codebook_dim=16,
        num_quantizers=4)
    codec = Encodec(800, 800, model_config=cfg, num_codebooks=4,
                    key=jax.random.PRNGKey(0))
    server = serve.CodecServer(codec, buckets_s=(0.5, 1.0), max_batch=2,
                               max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(0)
        reqs = [rng.standard_normal(int(800 * d)).astype(np.float32)
                for d in (0.3, 0.5, 0.9)]
        futs = [server.submit(w) for w in reqs]
        outs = [f.get(timeout=120) for f in futs]
        for w, o in zip(reqs, outs):
            assert o.shape == w.shape
            assert np.isfinite(o).all()
    finally:
        server.stop()


def test_serve_rejects_oversized_requests():
    """Requests beyond the largest bucket raise instead of silently
    truncating the delivered audio (review finding)."""
    import sys
    sys.path.insert(0, "examples")
    import numpy as np
    import pytest as _pytest
    from serve import CodecServer
    from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig

    cfg = EncodecModelConfig(sampling_rate=16000, num_filters=4,
                             hidden_size=16, upsampling_ratios=(20, 16),
                             codebook_size=32, codebook_dim=16,
                             num_quantizers=4)
    c = Encodec(16000, 16000, num_codebooks=2, model_config=cfg)
    srv = CodecServer(c, buckets_s=(0.5, 1.0), max_batch=2)
    try:
        with _pytest.raises(ValueError, match="largest bucket"):
            srv.submit(np.zeros(32000, np.float32))  # 2 s > 1 s bucket
    finally:
        srv.stop()
