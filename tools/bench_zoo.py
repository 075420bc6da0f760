"""Per-family roundtrip RTF on the real chip (default configs, random
weights — throughput is architecture-bound, not weight-bound).

Run: ``python tools/bench_zoo.py [--batch 4] [--seconds 10] [--families a,b]``
Timing = bench.py methodology: R roundtrips chained inside ONE jitted
``fori_loop`` (amortizes the remote-tunnel RTT and defeats memoization via
an inter-iteration data dependency), warmed twice (fresh param buffers pay
a one-time on-device layout settle — BENCH_NOTES round 3), best of 3.
"""

import os
import sys
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


def arg(name, default, cast):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


def bench_family(name, batch, seconds, reps, preset=None):
    from audiocodecs_tpu.models import get_codec_class

    if preset:
        from audiocodecs_tpu.serving import apply_serving_preset

        env = apply_serving_preset(name, preset)
        if env:
            print(f"  preset[{name}]: {env}", flush=True)
    cls = get_codec_class(name)
    codec = cls(sample_rate=cls_sr(cls), mode="reconstruct")
    sr = codec.config.orig_sample_rate
    T = int(sr * seconds)
    rng = np.random.default_rng(0)
    sig0 = jax.device_put(
        rng.standard_normal((batch, T)).astype(np.float32) * 0.1)

    @partial(jax.jit, static_argnums=2)
    def bench_loop(params, sig, R):
        def body(i, sig):
            toks = codec._sig_to_toks(params, sig, None)
            rec = codec._toks_to_sig(params, toks, None)
            rec = rec[:, : sig.shape[1]]
            pad = sig.shape[1] - rec.shape[1]
            if pad:
                rec = jnp.pad(rec, ((0, 0), (0, pad)))
            return rec * 0.9 + sig * 0.1 + (i.astype(jnp.float32) * 1e-6)

        return jnp.sum(jax.lax.fori_loop(0, R, body, sig))

    float(bench_loop(codec.params, sig0, reps))  # compile + warm
    float(bench_loop(codec.params, sig0, reps))  # settle layouts
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(bench_loop(codec.params, sig0, reps))
        best = min(best, time.perf_counter() - t0)
    dt = best / reps
    rtf = batch * seconds / dt
    print(f"{name}: {rtf:.1f}x aggregate ({rtf / batch:.1f}x/stream, "
          f"{dt * 1e3:.1f} ms per roundtrip, batch {batch} x {seconds:.0f}s "
          f"@ {sr} Hz)", flush=True)
    return rtf


def cls_sr(cls):
    return getattr(cls, "DEFAULT_ORIG_SR", 16000)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    fams = arg("--families",
               "bigcodec,magicodec,stablecodec,nanocodec,xcodec2",
               str).split(",")
    batch = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 6, int)
    print("device:", jax.devices()[0], flush=True)
    preset = arg("--preset", "", str)
    for f in fams:
        try:
            bench_family(f.strip(), batch, seconds, reps, preset=preset)
        except Exception as e:  # keep sweeping
            print(f"{f}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
