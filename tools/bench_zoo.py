"""Per-family roundtrip RTF on the real chip (default configs, random
weights — throughput is architecture-bound, not weight-bound).

Run: ``python tools/bench_zoo.py [--batch 4] [--seconds 10] [--families a,b]``
Timing: chained-iteration slope with scalar-fetch forcing (tunnel-safe).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def arg(name, default, cast):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


def bench_family(name, batch, seconds, reps):
    from audiocodecs_tpu.models import get_codec_class

    cls = get_codec_class(name)
    codec = cls(sample_rate=None or cls_sr(cls), mode="reconstruct")
    sr = codec.config.orig_sample_rate
    T = int(sr * seconds)
    rng = np.random.default_rng(0)
    sig0 = jax.device_put(
        rng.standard_normal((batch, T)).astype(np.float32) * 0.1)

    jfn = codec.jitted_roundtrip()  # params as jit args, resample included
    fn = lambda s: jfn(codec.params, s)  # noqa: E731
    out = fn(sig0)
    float(jnp.sum(out))  # force compile+run

    def chain(R):
        t0 = time.perf_counter()
        s = sig0
        for _ in range(R):
            s = fn(s)[:, :T] * 0.999  # data dependency, no memoization
        float(jnp.sum(s))
        return time.perf_counter() - t0

    t_full = chain(reps)
    t_half = chain(reps // 2)
    dt = (t_full - t_half) / (reps - reps // 2)
    rtf = batch * seconds / dt
    print(f"{name}: {rtf:.1f}x aggregate ({rtf / batch:.1f}x/stream, "
          f"{dt * 1e3:.1f} ms per roundtrip, batch {batch} x {seconds:.0f}s "
          f"@ {sr} Hz)", flush=True)
    return rtf


def cls_sr(cls):
    return getattr(cls, "DEFAULT_ORIG_SR", 16000)


def main():
    fams = arg("--families",
               "bigcodec,magicodec,stablecodec,nanocodec,xcodec2",
               str).split(",")
    batch = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 6, int)
    print("device:", jax.devices()[0], flush=True)
    for f in fams:
        try:
            bench_family(f.strip(), batch, seconds, reps)
        except Exception as e:  # keep sweeping
            print(f"{f}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
