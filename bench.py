"""Headline benchmark: EnCodec-24k encode+decode real-time factor on TPU.

Mirrors the reference's RTF measurement (reference ``test_sr.py:54-87,264-270``
— wall-clock around sig_to_toks/toks_to_sig, CUDA-synced) on the north-star
config (BASELINE.json: EnCodec 24 kHz, 8 codebooks, batched single-chip).

Timing methodology (important on remote-attached TPUs where
``block_until_ready`` can return early and per-call RTT is ~30 ms): the
roundtrip is iterated R times *inside* one jitted ``lax.fori_loop`` with a
data dependency between iterations, terminated by a scalar fetch; per-iter
time = best-of-3 wall / R, which AMORTIZES the per-call dispatch/RTT to
~1/R of an iteration (R=16 → ~2 ms on a 50 ms roundtrip). The stricter
two-loop-length slope variant (cancels the overhead exactly) lives in
tools/bench_dac_split.py and the SR recipe timers.

Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": ..., "vs_baseline": RTF/50}
baseline = 50× real-time per stream (BASELINE.json north star).
"""

import json
import os
import sys
import time


import numpy as np

# Fast-path selection (`--act`):
#   decbf16 (default) — exact-f32 encoder (6-pass accumulation; tokens
#     bit-identical to the f32 reference, measured token_match=1.0) + bf16
#     activations in the DECODER stacks (no argmin boundary there).
#     Measured on v5e: 1653× aggregate @ batch 16 (r1 baseline: 1299×).
# Batch default is 8: the batch dim then packs the 8-wide sublane tiling
# exactly — measured near-Pareto-optimal on v5e (192.6×/stream + 1541×
# aggregate, vs 103.9×/stream + 1662× at batch 16 and 177.9×/stream +
# 712× at batch 4). See BENCH_NOTES.md "batch sweep".
#   high — 3-pass-bf16 encoder accumulation + bf16 decoder: 1887× but
#     token_match 0.9998 at this scale (argmin-marginal flips).
#   bf16 — bf16 activations in both stacks; fastest encode, match ~0.97.
#   f32 — exact-f32 everywhere (the round-1 parity path).
if "--act" in sys.argv:
    _i = sys.argv.index("--act") + 1
    if _i >= len(sys.argv):
        sys.exit("--act requires a value: decbf16 | high | bf16 | f32")
    _ACT = sys.argv[_i]
else:
    _ACT = "decbf16"
# explicit mode: SET the env (an ambient ACX_* would otherwise override the
# requested mode while the JSON reports the requested label)
os.environ["ACX_DEC_CONV_PRECISION"] = ""  # pinned; modes below may override
if _ACT == "bf16":
    os.environ["ACX_ACT_DTYPE"] = "bfloat16"
elif _ACT == "decbf16":
    os.environ["ACX_ACT_DTYPE"] = "decoder-bfloat16"
    os.environ["ACX_CONV_PRECISION"] = "highest"
elif _ACT == "high":
    os.environ["ACX_ACT_DTYPE"] = "decoder-bfloat16"
    os.environ["ACX_CONV_PRECISION"] = "high"
elif _ACT == "f32":
    os.environ["ACX_ACT_DTYPE"] = "float32"
    os.environ["ACX_CONV_PRECISION"] = "highest"
elif _ACT == "dechigh":
    # exact-f32 encoder (tokens bit-exact) + HIGH (3-pass) f32-activation
    # DECODER convs — decode precision cannot affect tokens, and on DAC
    # this beat bf16 activations outright (BENCH_NOTES round 3).
    os.environ["ACX_ACT_DTYPE"] = "float32"
    os.environ["ACX_CONV_PRECISION"] = "highest"
    os.environ["ACX_DEC_CONV_PRECISION"] = "high"
elif _ACT == "decdefault":
    # exact-f32 encoder + 1-pass-bf16-matmul f32-activation decoder
    os.environ["ACX_ACT_DTYPE"] = "float32"
    os.environ["ACX_CONV_PRECISION"] = "highest"
    os.environ["ACX_DEC_CONV_PRECISION"] = "default"
else:
    sys.exit(f"unknown --act {_ACT!r}: "
             "decbf16 | dechigh | decdefault | high | bf16 | f32")


def main():
    import jax

    # Persistent compilation cache: first-ever run pays the (slow, remote)
    # compile; subsequent runs of the same config start in seconds.
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from audiocodecs_tpu.models.encodec import Encodec

    def arg(name, default, cast):
        return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

    batch = arg("--batch", 8, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 8, int)

    # Tunnel watchdog: a dead remote-TPU tunnel makes the first device op
    # hang indefinitely (observed: jax.devices() stuck for 8+ hours during
    # the 2026-08-17 outage). Fail fast with a diagnostic JSON line instead
    # so the driver records a clean rc=3 + reason. Cancelled once the
    # device has answered (first compile + token check done); 0 disables.
    watchdog_s = arg("--watchdog", 900.0, float)
    if watchdog_s > 0:
        import threading

        def _expire():
            print(json.dumps({
                "metric": "encodec24k_8cb_roundtrip_rtf",
                "value": 0.0,
                "unit": "x_realtime_aggregate",
                "vs_baseline": 0.0,
                "error": f"device probe/compile exceeded {watchdog_s:.0f}s "
                         "(TPU tunnel down?)",
            }), flush=True)
            os._exit(3)

        _watchdog = threading.Timer(watchdog_s, _expire)
        _watchdog.daemon = True
        _watchdog.start()
    else:
        _watchdog = None

    sr = 24000
    T = int(sr * seconds)
    codec = Encodec(sr, sr, num_codebooks=8, key=jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    sig0 = jax.device_put(rng.standard_normal((batch, T)).astype(np.float32) * 0.1)
    params = jax.device_put(codec.params)

    from functools import partial

    # Token agreement vs the exact-f32 path (not timed): the fast-path RTF
    # only counts against baseline when tokens are identical on the bench
    # signal. `tag` forces a separate trace per env configuration.
    @partial(jax.jit, static_argnums=2)
    def encode_only(params, sig, tag):
        del tag
        return codec._sig_to_toks(params, sig, None)

    saved = {k: os.environ.pop(k, None)
             for k in ("ACX_ACT_DTYPE", "ACX_CONV_PRECISION")}
    os.environ["ACX_CONV_PRECISION"] = "highest"
    toks_ref = np.asarray(encode_only(params, sig0, "ref_f32"))
    os.environ.pop("ACX_CONV_PRECISION", None)
    for k, v in saved.items():
        if v is not None:
            os.environ[k] = v
    toks_fast = np.asarray(encode_only(params, sig0, f"fast_{_ACT}"))
    token_match = float((toks_fast == toks_ref).mean())
    if _watchdog is not None:
        _watchdog.cancel()  # device + compile path proven alive

    @partial(jax.jit, static_argnums=2)
    def bench_loop(params, sig, R):
        def body(i, sig):
            toks = codec._sig_to_toks(params, sig, None)
            rec = codec._toks_to_sig(params, toks, None)
            rec = rec[:, : sig.shape[1]]
            pad = sig.shape[1] - rec.shape[1]
            if pad:
                rec = jnp.pad(rec, ((0, 0), (0, pad)))
            # data dependency between iterations (defeats any memoization)
            return rec * 0.9 + sig * 0.1 + (i.astype(jnp.float32) * 1e-6)

        out = jax.lax.fori_loop(0, R, body, sig)
        return jnp.sum(out)

    # ONE compiled graph; per-call fixed overhead (~30 ms relay RTT) is
    # amortized over `reps` chained roundtrips (<1% at reps=8).
    float(bench_loop(params, sig0, reps))  # compile + warm

    profile_dir = arg("--profile", None, str)
    best = float("inf")
    for it in range(3):
        if profile_dir and it == 1:  # trace one warm iteration
            with jax.profiler.trace(profile_dir):
                t0 = time.perf_counter()
                float(bench_loop(params, sig0, reps))
                best = min(best, time.perf_counter() - t0)
            continue
        t0 = time.perf_counter()
        float(bench_loop(params, sig0, reps))
        best = min(best, time.perf_counter() - t0)
    dt = best / reps

    audio_seconds = batch * seconds
    rtf = audio_seconds / dt
    # Baseline definition: ≥50× real-time *per stream*, batched (BASELINE.json).
    result = {
        "metric": "encodec24k_8cb_roundtrip_rtf",
        "value": round(rtf, 2),
        "unit": "x_realtime_aggregate",
        "vs_baseline": round(rtf / batch / 50.0, 3),
        "detail": {
            "batch": batch,
            "act_dtype": _ACT,
            "token_match": token_match,
            "seconds_per_stream": seconds,
            "wall_s_per_roundtrip": round(dt, 5),
            "per_stream_rtf": round(rtf / batch, 2),
            "reps": reps,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
