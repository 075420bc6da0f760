"""DAC-44.1k batched serving: poly-snake decode gate + roundtrip timing.

VERDICT r4 item 3 follow-through. The round-4 roofline split
(``bench_results/dac_roofline_b4.jsonl``) showed decoder stages 3-4
dominated by the snake transcendental (B4 decbf16 decode 270 ms, with
``ACX_SNAKE_APPROX=1`` 166.6 ms). This tool decides whether the poly
snake can ship in the batched serving preset:

1. GATE — decode the same exact-f32 tokens under the throughput-tier env
   (decoder-bfloat16 acts) with and without the poly snake; report the
   waveform deviation poly-vs-plain and each-vs-exact-f32. The poly's
   own error must be well inside the bf16-activation noise floor the
   preset already accepts (~1e-4..1e-3 of signal scale).
2. TIMING — full roundtrip (exact-f32 encode, token_match asserted) at
   batch 4/8 under decbf16 and decbf16+poly, bench.py chained-loop
   methodology.

Run (real chip, serialize): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_dac_poly.py [--batches 4,8] [--seconds 10] \
    [--out bench_results/dac_poly_r5.json]
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

    from audiocodecs_tpu.models.dac import DAC

    batches = [int(b) for b in arg("--batches", "4,8").split(",")]
    seconds = arg("--seconds", 10.0, float)
    tier2 = "--tier2" in sys.argv
    out_path = arg("--out", "bench_results/dac_poly_r5.json")
    sr = 44100
    T = int(sr * seconds)
    reps = arg("--reps", 4, int)

    codec = DAC(sample_rate=sr, orig_sample_rate=sr, num_codebooks=9,
                key=jax.random.PRNGKey(0))
    print("device:", jax.devices()[0], flush=True)
    results = {"sr": sr, "seconds": seconds}

    def set_env(act, dec_prec, snake, resunit="0", enc_prec="highest"):
        os.environ["ACX_ACT_DTYPE"] = act
        os.environ["ACX_CONV_PRECISION"] = enc_prec
        if dec_prec:
            os.environ["ACX_DEC_CONV_PRECISION"] = dec_prec
        else:
            os.environ.pop("ACX_DEC_CONV_PRECISION", None)
        os.environ["ACX_SNAKE_APPROX"] = snake
        os.environ["ACX_PALLAS_DAC_RESUNIT"] = resunit

    # ---------------- gate: decode deviation at batch 1 ---------------- #
    rng = np.random.default_rng(0)
    sig1 = jax.device_put(
        rng.standard_normal((1, T)).astype(np.float32) * 0.1)

    @partial(jax.jit, static_argnums=2)
    def enc(params, sig, tag):
        del tag
        return codec._sig_to_toks(params, sig, None)

    @partial(jax.jit, static_argnums=2)
    def dec(params, toks, tag):
        del tag
        return codec._toks_to_sig(params, toks, None)

    set_env("float32", "", "0")
    toks = enc(codec.params, sig1, "exact")
    rec_exact = np.asarray(dec(codec.params, toks, "exact"))
    set_env("decoder-bfloat16", "", "0")
    rec_bf16 = np.asarray(dec(codec.params, toks, "bf16"))
    set_env("decoder-bfloat16", "", "1")
    rec_poly = np.asarray(dec(codec.params, toks, "bf16poly"))
    scale = float(np.abs(rec_exact).max())

    def dev(a, b):
        return {"max_abs": float(np.abs(a - b).max()),
                "rms": float(np.sqrt(np.mean((a - b) ** 2))),
                "max_rel_to_scale": float(np.abs(a - b).max() / scale)}

    results["gate"] = {
        "waveform_scale": scale,
        "bf16_vs_exact": dev(rec_bf16, rec_exact),
        "poly_vs_bf16": dev(rec_poly, rec_bf16),
        "poly_vs_exact": dev(rec_poly, rec_exact),
    }
    if tier2:
        # tier-2 candidates on top of decbf16+poly: 1-pass decode dots
        # (ACX_DEC_CONV_PRECISION=default) and the fused Pallas resunit
        set_env("decoder-bfloat16", "default", "1")
        rec_1p = np.asarray(dec(codec.params, toks, "bf16poly1p"))
        set_env("decoder-bfloat16", "default", "1", resunit="1")
        rec_ru = np.asarray(dec(codec.params, toks, "bf16poly1pru"))
        results["gate"]["poly1pass_vs_exact"] = dev(rec_1p, rec_exact)
        results["gate"]["poly1pass_resunit_vs_exact"] = dev(rec_ru,
                                                            rec_exact)
    print("gate:", json.dumps(results["gate"], indent=1), flush=True)

    # ---------------- timing: roundtrip at B4/B8 ---------------- #
    def measure(batch, act, snake, tag, dec_prec="", resunit="0",
                enc_prec="highest"):
        set_env(act, dec_prec, snake, resunit, enc_prec)
        rng = np.random.default_rng(0)
        sig0 = jax.device_put(
            rng.standard_normal((batch, T)).astype(np.float32) * 0.1)

        # token honesty: preset encode == exact-f32 encode
        saved = os.environ.get("ACX_ACT_DTYPE")
        set_env("float32", "", "0")
        toks_ref = np.asarray(enc(codec.params, sig0, f"ref{batch}"))
        set_env(saved, dec_prec, snake, resunit, enc_prec)
        toks_fast = np.asarray(enc(codec.params, sig0, tag))
        token_match = float((toks_fast == toks_ref).mean())

        @partial(jax.jit, static_argnums=(2, 3))
        def bench_loop(params, sig, R, tag):
            del tag

            def body(i, sig):
                t = codec._sig_to_toks(params, sig, None)
                rec = codec._toks_to_sig(params, t, None)
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
        row = {"batch": batch, "mode": tag,
               "roundtrip_ms": round(dt * 1e3, 1),
               "rtf_aggregate": round(batch * seconds / dt, 1),
               "rtf_per_stream": round(seconds / dt, 1),
               "token_match": token_match}
        print(json.dumps(row), flush=True)
        return row

    rows = []
    for b in batches:
        if tier2:
            # poly1p measured a no-op (bf16 activations are already
            # 1-pass dots: 356.1 vs 355.5 ms @B4); polyru without
            # dec_prec was a Mosaic reject pre-fix and now resolves to
            # the same DEFAULT kernel as poly1pru — two modes remain.
            rows.append(measure(b, "decoder-bfloat16", "1",
                                f"decbf16poly_b{b}"))
            rows.append(measure(b, "decoder-bfloat16", "1",
                                f"decbf16poly1pru_b{b}",
                                dec_prec="default", resunit="1"))
            # encoder 3-pass (ACX_CONV_PRECISION=high): certificate-
            # backed 0-flip mode (projected-cosine margin 0.174, r2);
            # token_match is still measured against exact f32 here
            rows.append(measure(b, "decoder-bfloat16", "1",
                                f"decbf16poly1pruEh_b{b}",
                                dec_prec="default", resunit="1",
                                enc_prec="high"))
        else:
            rows.append(measure(b, "decoder-bfloat16", "0",
                                f"decbf16_b{b}"))
            rows.append(measure(b, "decoder-bfloat16", "1",
                                f"decbf16poly_b{b}"))
        results["timing"] = rows
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
