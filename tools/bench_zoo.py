"""Per-family roundtrip RTF on the real chip (default configs, random
weights — throughput is architecture-bound, not weight-bound).

Run::

    python tools/bench_zoo.py --families all --preset balanced \
        [--batch 4] [--seconds 10] [--out runs/bench/zoo.json] [--resume]

Timing = bench.py methodology: R roundtrips chained inside ONE jitted
``fori_loop`` (amortizes the remote-tunnel RTT and defeats memoization via
an inter-iteration data dependency), warmed twice (fresh param buffers pay
a one-time on-device layout settle — BENCH_NOTES round 3), best of 3.

Each family also reports ``token_match``: fraction of tokens identical
between the preset-env encode and the exact-f32 (``ACX_CONV_PRECISION=
highest``) encode on the bench signal — the honesty column next to RTF
(serving presets only count if tokens are bit-exact).

Results are flushed to ``--out`` after EVERY family, so a mid-sweep
tunnel drop loses at most one family; ``--resume`` skips families already
recorded with a successful measurement (failures are retried).

``--compare`` measures each family under the three candidate precision
modes (exact-f32 / EnCodec-style bf16-decode-acts / DAC-style HIGH-decode)
and records the fastest TOKEN-EXACT one — the measurement that feeds
``serving.SERVING_PRESETS`` for families without a preset yet.
"""

import json
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


def cls_sr(cls):
    return getattr(cls, "DEFAULT_ORIG_SR", 16000)


_KNOBS = ("ACX_ACT_DTYPE", "ACX_CONV_PRECISION", "ACX_DEC_CONV_PRECISION",
          "ACX_SNAKE_APPROX", "ACX_PALLAS_DAC_RESUNIT")

# --compare candidates: the two measured winning shapes from BENCH_NOTES
# (EnCodec-style bf16-decode-activations vs DAC-style f32+HIGH-decode)
# against the exact-f32 baseline. Token exactness is measured, not
# assumed — a mode only "wins" at token_match == 1.0.
COMPARE_MODES = {
    "exact": {"ACX_ACT_DTYPE": "float32",
              "ACX_CONV_PRECISION": "highest",
              "ACX_DEC_CONV_PRECISION": ""},
    "encodec_style": {"ACX_ACT_DTYPE": "decoder-bfloat16",
                      "ACX_CONV_PRECISION": "highest",
                      "ACX_DEC_CONV_PRECISION": ""},
    "dac_style": {"ACX_ACT_DTYPE": "float32",
                  "ACX_CONV_PRECISION": "highest",
                  "ACX_DEC_CONV_PRECISION": "high"},
}


def bench_family(name, batch, seconds, reps, preset=None, env_override=None):
    from audiocodecs_tpu.models import get_codec_class

    env_set = {}
    if env_override is not None:
        env_set = dict(env_override)
        for k in _KNOBS:
            os.environ.pop(k, None)
        os.environ.update({k: v for k, v in env_set.items() if v})
    elif preset:
        from audiocodecs_tpu.serving import apply_serving_preset

        # Families without a preset must run at the library default —
        # clear the knobs FIRST or the previous family's preset leaks
        # (pre-fix zoo_r4.json rows for no-preset families actually ran
        # with leaked decoder-bf16; token_match was still measured
        # correctly within each run).
        for k in _KNOBS:
            os.environ.pop(k, None)
        env_set = apply_serving_preset(name, preset, batch=batch)
        if env_set:
            print(f"  preset[{name}]: {env_set}", flush=True)
    cls = get_codec_class(name)
    codec = cls(sample_rate=cls_sr(cls), mode="reconstruct")
    sr = codec.config.orig_sample_rate
    T = int(sr * seconds)
    rng = np.random.default_rng(0)
    sig0 = jax.device_put(
        rng.standard_normal((batch, T)).astype(np.float32) * 0.1)

    # Token agreement vs the exact-f32 encode (not timed) — bench.py's
    # methodology: env knobs are trace-time, so force separate traces via
    # a static tag while swapping the env.
    @partial(jax.jit, static_argnums=2)
    def encode_only(params, sig, tag):
        del tag
        return codec._sig_to_toks(params, sig, None)

    saved = {k: os.environ.pop(k, None)
             for k in ("ACX_ACT_DTYPE", "ACX_CONV_PRECISION",
                       "ACX_DEC_CONV_PRECISION")}
    os.environ["ACX_CONV_PRECISION"] = "highest"
    toks_ref = np.asarray(encode_only(codec.params, sig0, "ref_f32"))
    os.environ.pop("ACX_CONV_PRECISION", None)
    for k, v in saved.items():
        if v is not None:
            os.environ[k] = v
    toks_fast = np.asarray(
        encode_only(codec.params, sig0, f"fast_{sorted(env_set.items())}"))
    token_match = float((toks_fast == toks_ref).mean())

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
          f"@ {sr} Hz, token_match {token_match:.4f})", flush=True)
    return {
        "rtf_aggregate": round(rtf, 1),
        "rtf_per_stream": round(rtf / batch, 1),
        "roundtrip_ms": round(dt * 1e3, 1),
        "token_match": token_match,
        "sample_rate": sr,
        "env": env_set,
    }


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    fams_arg = arg("--families",
                   "bigcodec,magicodec,stablecodec,nanocodec,xcodec2", str)
    if fams_arg == "all":
        from audiocodecs_tpu.models import available_codecs

        fams = available_codecs()
    else:
        fams = [f.strip() for f in fams_arg.split(",")]
    batch = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 6, int)
    preset = arg("--preset", "", str)
    out_path = arg("--out", "runs/bench/zoo.json", str)
    resume = "--resume" in sys.argv
    # --env "K=V;K=V": explicit knob override instead of the family preset
    # (probing precision candidates; token_match is measured either way).
    env_flag = arg("--env", "", str)
    env_override = None
    if env_flag:
        env_override = dict(kv.split("=", 1)
                            for kv in env_flag.split(";") if kv)

    results = {}
    if resume and os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f).get("families", {})
        done = [k for k, v in results.items() if "rtf_aggregate" in v]
        print(f"resume: {len(done)} families already measured "
              f"({', '.join(done)})", flush=True)

    print("device:", jax.devices()[0], flush=True)

    def flush():
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"preset": preset, "batch": batch,
                       "seconds": seconds, "reps": reps,
                       "families": results}, f, indent=1)

    compare = "--compare" in sys.argv
    for f in fams:
        if resume and (
            "rtf_aggregate" in results.get(f, {})
            or (compare and "modes" in results.get(f, {}))
        ):
            continue
        try:
            if compare:
                modes = {}
                for mode, env in COMPARE_MODES.items():
                    print(f"  compare[{f}] {mode}: {env}", flush=True)
                    modes[mode] = bench_family(
                        f, batch, seconds, reps, env_override=env)
                exact_ok = [m for m, r in modes.items()
                            if r["token_match"] == 1.0]
                winner = max(exact_ok,
                             key=lambda m: modes[m]["rtf_aggregate"])
                results[f] = {"modes": modes, "winner": winner,
                              "winner_env": COMPARE_MODES[winner],
                              "winner_rtf": modes[winner]["rtf_aggregate"]}
                print(f"{f}: winner={winner} "
                      f"({modes[winner]['rtf_aggregate']}x vs exact "
                      f"{modes['exact']['rtf_aggregate']}x)", flush=True)
            elif env_override is not None:
                results[f] = bench_family(f, batch, seconds, reps,
                                          env_override=env_override)
            else:
                results[f] = bench_family(f, batch, seconds, reps,
                                          preset=preset)
        except Exception as e:  # keep sweeping
            print(f"{f}: FAILED {type(e).__name__}: {e}", flush=True)
            results[f] = {"error": f"{type(e).__name__}: {e}"}
        flush()
    flush()
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
