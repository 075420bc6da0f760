"""DAC-44.1k serving curve + decoder variants under the round-3 modes.

Measures (v5e, in-graph loop, exact-f32 encoder → token_match 1.0):
  1. batch sweep at dec=high (the quality-safe serving mode),
  2. polyphase transposed-conv decode (ACX_POLYPHASE_CONVTR) on/off at
     batch 1 — DAC's decoder is transposed-conv-heavy at 44.1 kHz out.

Run: ``python tools/bench_dac_curve.py``
"""

import os
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from audiocodecs_tpu.models.dac import DAC

    sr, seconds, reps = 44100, 10.0, 8
    T = int(sr * seconds)
    os.environ["ACX_ACT_DTYPE"] = "float32"
    os.environ["ACX_CONV_PRECISION"] = "highest"
    os.environ["ACX_DEC_CONV_PRECISION"] = "high"
    codec = DAC(sample_rate=sr, orig_sample_rate=sr, num_codebooks=9,
                key=jax.random.PRNGKey(0))
    print("device:", jax.devices()[0], flush=True)

    def measure(batch, tag):
        rng = np.random.default_rng(0)
        sig0 = jax.device_put(
            rng.standard_normal((batch, T)).astype(np.float32) * 0.1)

        @partial(jax.jit, static_argnums=(2, 3))
        def bench_loop(params, sig, R, tag):
            del tag

            def body(i, sig):
                toks = codec._sig_to_toks(params, sig, None)
                rec = codec._toks_to_sig(params, toks, None)
                rec = rec[:, : sig.shape[1]]
                pad = sig.shape[1] - rec.shape[1]
                if pad:
                    rec = jnp.pad(rec, ((0, 0), (0, pad)))
                return rec * 0.9 + sig * 0.1 + i.astype(jnp.float32) * 1e-6

            return jnp.sum(jax.lax.fori_loop(0, R, body, sig))

        float(bench_loop(codec.params, sig0, reps, tag))
        float(bench_loop(codec.params, sig0, reps, tag))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(bench_loop(codec.params, sig0, reps, tag))
            best = min(best, time.perf_counter() - t0)
        dt = best / reps
        rtf = batch * seconds / dt
        print(f"{tag}: batch {batch}: {dt*1e3:.1f} ms/roundtrip, "
              f"{rtf:.1f}x aggregate ({rtf/batch:.1f}x/stream)", flush=True)

    for batch in (1, 2, 4, 8):
        measure(batch, f"dechigh-b{batch}")

    # ---- per-stage decoder split (batch 1, dec=default) ---- #
    # Times the decoder truncated after each upsampling stage; successive
    # differences localize the cost.
    import math

    from audiocodecs_tpu.models.dac import _conv, _convtr, _residual_unit, snake

    os.environ["ACX_DEC_CONV_PRECISION"] = "default"
    mc = codec.model_config
    rng = np.random.default_rng(0)
    N = int(T // mc.hop_length)
    toks0 = jax.device_put(rng.integers(
        0, mc.codebook_size, (1, N, 9)).astype(np.int32))

    def dec_prefix(params, toks, n_stages, prev):
        from audiocodecs_tpu.models.dac import dac_rvq_decode
        from audiocodecs_tpu.nn.layers import conv_role

        q = dac_rvq_decode(toks, params["quantizer"])
        p = params["decoder"]
        with conv_role("decoder"):
            h = _conv(q, p["conv_in"], pad=3)
            h = h + (prev != prev).astype(h.dtype)
            for bi, stride in enumerate(mc.upsampling_ratios[:n_stages]):
                b = p["blocks"][bi]
                h = snake(h, b["alpha_up"])
                h = _convtr(h, b["convtr"], stride=stride,
                            pad=math.ceil(stride / 2))
                for ri, dil in enumerate((1, 3, 9)):
                    h = _residual_unit(h, b["res"][ri], dil)
        return jnp.sum(h[:, :, :1].astype(jnp.float32))

    import functools

    for n_stages in (0, 1, 2, 3, 4):
        fn = jax.jit(functools.partial(dec_prefix, n_stages=n_stages))
        fn(codec.params, toks0, prev=jnp.float32(0.0))

        def chain(R):
            t0 = time.perf_counter()
            prev = jnp.float32(0.0)
            for _ in range(R):
                prev = fn(codec.params, toks0, prev=prev)
            float(prev)
            return time.perf_counter() - t0

        chain(4)
        dt = (chain(8) - chain(4)) / 4
        print(f"decoder prefix {n_stages} stages: {dt*1e3:.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
