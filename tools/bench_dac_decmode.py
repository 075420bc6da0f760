"""DAC-44.1k roundtrip under decoder-precision modes (v5e, batch 1 × 10 s).

Encoder stays exact-f32 (tokens bit-identical to the parity path by
construction — decode precision cannot touch the argmin); the decoder
rides ``ACX_DEC_CONV_PRECISION`` ∈ {highest, high, default} or bf16
activations. Timing = bench.py methodology: R roundtrips chained inside
ONE jitted ``fori_loop`` (amortizes tunnel RTT), warmed, best of 3.

Run: ``python tools/bench_dac_decmode.py [--batch 1] [--seconds 10]``
"""

import os
import sys
import time
from functools import partial

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
    os.environ["ACX_ACT_DTYPE"] = "float32"
    os.environ["ACX_CONV_PRECISION"] = "highest"
    codec = DAC(sample_rate=sr, orig_sample_rate=sr, num_codebooks=9,
                key=jax.random.PRNGKey(0))
    params = codec.params
    rng = np.random.default_rng(0)
    sig0 = jax.device_put(
        rng.standard_normal((batch, T)).astype(np.float32) * 0.1)
    print("device:", jax.devices()[0], flush=True)

    @partial(jax.jit, static_argnums=(2, 3))
    def bench_loop(params, sig, R, tag):
        del tag  # forces a separate trace per env mode

        def body(i, sig):
            toks = codec._sig_to_toks(params, sig, None)
            rec = codec._toks_to_sig(params, toks, None)
            rec = rec[:, : sig.shape[1]]
            pad = sig.shape[1] - rec.shape[1]
            if pad:
                rec = jnp.pad(rec, ((0, 0), (0, pad)))
            return rec * 0.9 + sig * 0.1 + (i.astype(jnp.float32) * 1e-6)

        return jnp.sum(jax.lax.fori_loop(0, R, body, sig))

    @partial(jax.jit, static_argnums=1)
    def encode_only(params, tag, sig):
        del tag
        return codec._sig_to_toks(params, sig, None)

    toks_ref = np.asarray(encode_only(params, "ref", sig0))

    modes = [
        ("dec=highest", {"ACX_DEC_CONV_PRECISION": "highest"}),
        ("dec=high", {"ACX_DEC_CONV_PRECISION": "high"}),
        ("dec=default", {"ACX_DEC_CONV_PRECISION": "default"}),
        ("dec=bf16act", {"ACX_DEC_CONV_PRECISION": "",
                         "ACX_ACT_DTYPE": "decoder-bfloat16"}),
    ]
    for label, env in modes:
        os.environ["ACX_ACT_DTYPE"] = "float32"
        os.environ["ACX_DEC_CONV_PRECISION"] = ""
        for k, v in env.items():
            os.environ[k] = v
        tm = float((np.asarray(encode_only(params, label, sig0))
                    == toks_ref).mean())
        float(bench_loop(params, sig0, reps, label))  # compile + warm
        float(bench_loop(params, sig0, reps, label))  # settle layouts
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(bench_loop(params, sig0, reps, label))
            best = min(best, time.perf_counter() - t0)
        dt = best / reps
        rtf = batch * seconds / dt
        print(f"{label}: {dt*1e3:.1f} ms/roundtrip, {rtf:.1f}x aggregate "
              f"({rtf/batch:.1f}x/stream), token_match {tm}", flush=True)


if __name__ == "__main__":
    main()
