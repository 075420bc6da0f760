"""DAC-44.1k batch-1 component split on the real chip.

Times conv-encoder / RVQ / decoder separately under each precision mode to
locate where the 224.7 ms batch-1 roundtrip goes (BENCH_NOTES round-2 DAC
serving curve) before optimizing. Chained-slope timing, tunnel-safe.

Run: ``python tools/bench_dac_split.py [--batch 1] [--seconds 10]``
"""

import os
import sys
import time

import numpy as np


def arg(name, default, cast):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


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

    batch = arg("--batch", 1, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 8, int)
    sr = 44100
    T = int(sr * seconds)
    codec = DAC(sample_rate=sr, orig_sample_rate=sr, num_codebooks=9,
                key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    sig0 = jax.device_put(
        rng.standard_normal((batch, T)).astype(np.float32) * 0.1)
    print("device:", jax.devices()[0], flush=True)

    def slope(step, x0):
        """step: x -> x (device arrays); returns per-iter seconds."""
        x = step(x0)
        float(jnp.sum(jnp.asarray(x, jnp.float32)))  # compile + settle

        def chain(R):
            t0 = time.perf_counter()
            y = x0
            for _ in range(R):
                y = step(y)
            float(jnp.sum(jnp.asarray(y, jnp.float32)))
            return time.perf_counter() - t0

        t_full = chain(reps)
        t_half = chain(reps // 2)
        return (t_full - t_half) / (reps - reps // 2)

    def enc_mode(label, act, prec):
        os.environ["ACX_ACT_DTYPE"] = act
        os.environ["ACX_CONV_PRECISION"] = prec

        @jax.jit
        def feats_fn(params, sig):
            return codec._sig_to_feats(params, sig, None)

        @jax.jit
        def toks_fn(params, sig):
            return codec._sig_to_toks(params, sig, None)

        dt_f = slope(
            lambda s: sig0 * (1.0 + 0.0 * jnp.sum(
                jnp.asarray(feats_fn(codec.params, s)[:, 0, :8],
                            jnp.float32))), sig0)
        dt_t = slope(
            lambda s: sig0 * (1.0 + 0.0 * jnp.sum(jnp.asarray(
                toks_fn(codec.params, s)[:, 0, :], jnp.float32))), sig0)
        print(f"encode[{label}]: conv-feats {dt_f*1e3:.1f} ms, "
              f"feats+rvq {dt_t*1e3:.1f} ms  "
              f"(rvq ≈ {(dt_t-dt_f)*1e3:.1f} ms)", flush=True)
        return toks_fn

    toks_fn = enc_mode("exact-f32", "float32", "highest")
    enc_mode("high-3pass", "float32", "high")
    enc_mode("bf16-act", "bfloat16", "highest")

    toks0 = toks_fn(codec.params, sig0)

    def dec_mode(label, act, prec):
        os.environ["ACX_ACT_DTYPE"] = act
        os.environ["ACX_CONV_PRECISION"] = prec

        @jax.jit
        def dec_fn(params, toks, prev):
            toks = toks + (prev != prev).astype(toks.dtype)
            return codec._toks_to_sig(params, toks, None)

        dt = slope(lambda p: dec_fn(codec.params, toks0, p)[0, 0], sig0[0, 0])
        print(f"decode[{label}]: {dt*1e3:.1f} ms", flush=True)

    dec_mode("bf16-act", "bfloat16", "highest")
    dec_mode("exact-f32", "float32", "highest")
    dec_mode("high-3pass", "float32", "high")


if __name__ == "__main__":
    main()
