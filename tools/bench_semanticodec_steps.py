"""SemantiCodec ``ddim_sample_step`` sweep (the reference's own knob).

The reference constructor exposes ``ddim_sample_step=50`` as a
first-class argument (``/root/reference/audiocodecs/semanticodec.py:43``)
and the split bench (``bench_results/semanticodec_split_r5.json``) puts
88% of decode in the sequential DDIM scan — so reduced-step decode is
the family's legitimate latency tier, available identically to reference
users. Tokens are produced by the AudioMAE+VQ encoder and do not depend
on the step count, so token_match is measured (and must stay 1.0) but
the real tradeoff is decode fidelity: we report the mel-L1 deviation of
each reduced-step reconstruction vs the 50-step reconstruction of the
SAME tokens. With random weights that deviation is only indicative —
the quality/step curve must be re-validated once real checkpoints can
be converted (docs/CONVERTERS.md).

Run (real chip, serialize): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_semanticodec_steps.py [--batch 1] [--seconds 10]
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def arg(name, default, cast=str):
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
    print("device:", jax.devices()[0], flush=True)

    from audiocodecs_tpu.downstream.metrics.dsp import mel_distance
    from audiocodecs_tpu.models.semanticodec import SemantiCodec
    from audiocodecs_tpu.serving import apply_serving_preset

    B = arg("--batch", 1, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 3, int)
    steps_list = [int(s) for s in arg("--steps", "50,25,10").split(",")]
    out_path = arg("--out", "bench_results/semanticodec_steps_r5.json")

    env = apply_serving_preset("semanticodec", "balanced", batch=B)
    print("preset env:", env, flush=True)

    sr = 16000
    T = int(sr * seconds)
    rng = np.random.default_rng(0)
    sig0 = jax.device_put(
        rng.standard_normal((B, T)).astype(np.float32) * 0.1)

    results = {"batch": B, "seconds": seconds, "env": env, "sweeps": []}
    rec_ref = None  # 50-step reconstruction of the same tokens
    toks_ref = None

    for steps in steps_list:
        codec = SemantiCodec(sample_rate=sr, orig_sample_rate=sr,
                             mode="reconstruct",
                             ddim_sample_step=steps,
                             key=jax.random.PRNGKey(0))
        p = codec.params

        toks = np.asarray(jax.jit(codec._sig_to_toks)(p, sig0, None))
        if toks_ref is None:
            toks_ref = toks
        token_match = float((toks == toks_ref).mean())

        rec = np.asarray(
            jax.jit(codec._toks_to_sig)(p, jnp.asarray(toks), None))
        if rec_ref is None:
            rec_ref = rec
        L = min(rec.shape[1], rec_ref.shape[1])
        meld = float(mel_distance(jnp.asarray(rec[:, :L]),
                                  jnp.asarray(rec_ref[:, :L]),
                                  sample_rate=sr))

        @partial(jax.jit, static_argnums=2)
        def bench_loop(params, sig, R):
            def body(i, sig):
                tk = codec._sig_to_toks(params, sig, None)
                rc = codec._toks_to_sig(params, tk, None)
                rc = rc[:, : sig.shape[1]]
                pad = sig.shape[1] - rc.shape[1]
                if pad:
                    rc = jnp.pad(rc, ((0, 0), (0, pad)))
                return rc * 0.9 + sig * 0.1 + i.astype(jnp.float32) * 1e-6

            return jnp.sum(jax.lax.fori_loop(0, R, body, sig))

        float(bench_loop(p, sig0, reps))
        float(bench_loop(p, sig0, reps))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(bench_loop(p, sig0, reps))
            best = min(best, time.perf_counter() - t0)
        dt = best / reps
        rtf = B * seconds / dt
        row = {
            "ddim_steps": steps,
            "rtf_aggregate": round(rtf, 1),
            "rtf_per_stream": round(rtf / B, 1),
            "roundtrip_ms": round(dt * 1e3, 1),
            "token_match": token_match,
            "mel_l1_vs_50step": round(meld, 4),
        }
        results["sweeps"].append(row)
        print(f"steps={steps}: {rtf / B:.1f}x/stream "
              f"({dt * 1e3:.1f} ms, token_match {token_match:.4f}, "
              f"melD vs 50-step {meld:.4f})", flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
