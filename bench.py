"""Headline benchmark: EnCodec-24k encode+decode real-time factor on TPU.

Mirrors the reference's RTF measurement (reference ``test_sr.py:54-87,264-270``
times sig_to_toks/toks_to_sig with ``cuda.synchronize``; here
``block_until_ready`` plays that role) on the north-star config
(BASELINE.json: EnCodec 24 kHz, 8 codebooks, batched single-chip).

Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "x_realtime_per_stream", "vs_baseline": RTF/50}

baseline = 50× real-time per stream (BASELINE.json north star).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax

    from audiocodecs_tpu.models.encodec import Encodec

    batch = int(sys.argv[sys.argv.index("--batch") + 1]) if "--batch" in sys.argv else 8
    seconds = float(sys.argv[sys.argv.index("--seconds") + 1]) if "--seconds" in sys.argv else 10.0

    sr = 24000
    T = int(sr * seconds)
    codec = Encodec(sr, sr, num_codebooks=8, key=jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    sig = jax.device_put(rng.standard_normal((batch, T)).astype(np.float32) * 0.1)

    def roundtrip(params, sig):
        toks = codec._sig_to_toks(params, sig, None)
        return codec._toks_to_sig(params, toks, None)

    fn = jax.jit(roundtrip)
    params = jax.device_put(codec.params)

    # Warmup (compile + cache)
    fn(params, sig).block_until_ready()
    fn(params, sig).block_until_ready()

    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn(params, sig)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / runs

    audio_seconds = batch * seconds
    rtf = audio_seconds / dt  # aggregate x-realtime across the batch
    per_stream = rtf / batch  # per-stream speedup at this batch size
    result = {
        "metric": "encodec24k_8cb_roundtrip_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_aggregate",
        "vs_baseline": round(rtf / 50.0, 3),
        "detail": {
            "batch": batch,
            "seconds_per_stream": seconds,
            "wall_s_per_iter": round(dt, 4),
            "per_stream_rtf": round(per_stream, 2),
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
