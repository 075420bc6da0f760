"""BigCodec component attribution (zoo sub-50 family: 32.9x/stream @B4).

The round-5 envelope (``bench_results/envelope_r5b.json``) put BigCodec
5.2x over its XLA-cost-analysis roofline (304 ms measured vs 59 ms) — but
that roofline under-counts the four H=1536 LSTM layers (2 encoder + 2
decoder, ``models/bigcodec.py``): ``_pallas_enabled(1536)`` is False
(w_hh [1536, 6144] f32 = 37.7 MB > ~16 MB VMEM), so the recurrence runs
as ``lax.scan`` re-reading w_hh from HBM every one of T/hop = 800 steps.
Mandatory traffic: 4 layers x 800 steps x 37.7 MB = 121 GB = 147 ms at
819 GB/s — half the measured roundtrip, invisible to cost analysis
(which counts the scan body bytes once x trip count... verified here).

Probes:
  1. encode_full / decode_full under the serving preset (tier env).
  2. enc/dec LSTM stack alone ([B, 800, 1536] f32, 2 layers each).
  3. the same LSTM with w_hh+w_ih cast to bf16 (halves the per-step
     traffic; decode-side safe, encoder-side needs a token_match gate).
  4. token_match of the bf16-w_hh ENCODER LSTM vs exact (the gate for 3).

Run (real chip, serialize): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_bigcodec.py [--batch 4] [--seconds 10]
"""

import json
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
    print("device:", jax.devices()[0], flush=True)

    from audiocodecs_tpu.models.bigcodec import BigCodec
    from audiocodecs_tpu.nn.lstm import lstm
    from audiocodecs_tpu.serving import apply_serving_preset

    B = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 4, int)
    out_path = arg("--out", "bench_results/bigcodec_split_r5.json", str)

    codec = BigCodec(sample_rate=16000, orig_sample_rate=16000,
                     key=jax.random.PRNGKey(0))
    mc = codec.model_config
    T = int(16000 * seconds)
    N = T // mc.hop_length  # 800 @ 10 s
    W = mc.enc_width  # 1536
    rng = np.random.default_rng(0)
    sig = jax.device_put(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    h = jax.device_put(
        rng.standard_normal((B, N, W)).astype(np.float32) * 0.1)
    p = codec.params
    results = {"batch": B, "seconds": seconds, "timings_ms": {}}

    def timed(name, make_fn, *args):
        # params as jit ARGUMENTS (never closed over — compile tunnel 413)
        jfn = jax.jit(partial(make_fn, R=reps))
        float(jfn(p, *args))
        float(jfn(p, *args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(p, *args))
            best = min(best, time.perf_counter() - t0)
        ms = best / reps * 1e3
        results["timings_ms"][name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        return ms

    def loop(body, pp, x0, R):
        out = x0
        for i in range(R):
            out = body(pp, out) + i * 1e-6  # data dep defeats memoization
        return jnp.sum(out)

    env = apply_serving_preset("bigcodec", "balanced", batch=B)
    results["env"] = env
    print("preset env:", env, flush=True)

    def rt_body(pp, s):
        t = codec._sig_to_toks(pp, s, None)
        rec = codec._toks_to_sig(pp, t, None)
        rec = rec[:, : s.shape[1]]
        pad = s.shape[1] - rec.shape[1]
        if pad:
            rec = jnp.pad(rec, ((0, 0), (0, pad)))
        return s * 0.1 + rec * 0.9

    if "--eh-only" in sys.argv:
        # PROBE (not the preset): encoder convs at HIGH (3-pass bf16).
        # The LSTM recurrence pins Precision.HIGHEST internally, so only
        # the conv stack changes; token_match is measured vs exact f32.
        toks0 = jax.jit(partial(codec._sig_to_toks))(p, sig, None)
        os.environ["ACX_CONV_PRECISION"] = "high"
        ms = timed("roundtrip_enc_high",
                   lambda pp, s, R: loop(rt_body, pp, s, R), sig)
        results["rtf_per_stream_enc_high"] = round(seconds / (ms / 1e3), 1)
        toks_eh = np.asarray(jax.jit(
            lambda pp, s: codec._sig_to_toks(pp, s, None))(p, sig))
        results["enc_high_token_match"] = float(
            (toks_eh == np.asarray(toks0)).mean())
        print("enc-high token_match:", results["enc_high_token_match"],
              flush=True)
        out_path = out_path.replace(".json", "_eh.json")
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(results, f, indent=1)
        print(f"wrote {out_path}")
        return

    # 1. full encode / decode under the preset
    def enc_body(pp, s):
        toks = codec._sig_to_toks(pp, s, None)
        return s + toks.astype(jnp.float32).mean() * 1e-6

    timed("encode_full", lambda pp, s, R: loop(enc_body, pp, s, R), sig)

    toks0 = jax.jit(codec._sig_to_toks)(p, sig, None)

    def dec_body(pp, t):
        # thread the carry into the token input so XLA cannot CSE the R
        # decode calls into one (isfinite(t) is opaque at compile time;
        # the first measurement of this probe was 4x under-reported)
        toks_dep = jnp.where(jnp.isfinite(t), toks0, 0)
        rec = codec._toks_to_sig(pp, toks_dep, None)
        return t + rec.mean() * 1e-6

    timed("decode_full", lambda pp, t, R: loop(dec_body, pp, t, R),
          jnp.zeros(()))

    # 2. LSTM stacks alone (f32, the shipped path)
    def enc_lstm_body(pp, hh):
        y, _ = lstm(hh, pp["encoder"]["rnn"])
        return hh + y * 1e-6

    timed("enc_lstm_f32", lambda pp, hh, R: loop(enc_lstm_body, pp, hh, R),
          h)

    def dec_lstm_body(pp, hh):
        y, _ = lstm(hh, pp["decoder"]["rnn"])
        return hh + y * 1e-6

    timed("dec_lstm_f32", lambda pp, hh, R: loop(dec_lstm_body, pp, hh, R),
          h)

    # 3. bf16-weight LSTM candidate (halved w_hh traffic per step)
    def lstm_bf16w(pp, hh, which):
        pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.ndim == 2 else a, pp[which]["rnn"])
        y, _ = lstm(hh, pb)
        return y

    def enc_lstm_bf16_body(pp, hh):
        return hh + lstm_bf16w(pp, hh, "encoder").astype(jnp.float32) * 1e-6

    timed("enc_lstm_bf16w",
          lambda pp, hh, R: loop(enc_lstm_bf16_body, pp, hh, R), h)

    # 3b. wide Pallas LSTM (w_hh resident in VMEM via raised vmem_limit)
    os.environ["ACX_PALLAS_LSTM_WIDE"] = "1"
    timed("enc_lstm_pallas_wide",
          lambda pp, hh, R: loop(enc_lstm_body, pp, hh, R), h)

    # 3c. full roundtrip under the wide-LSTM knob, token_match asserted
    ms = timed("roundtrip_pallas_wide",
               lambda pp, s, R: loop(rt_body, pp, s, R), sig)
    results["rtf_per_stream_pallas_wide"] = round(seconds / (ms / 1e3), 1)
    toks_wide = np.asarray(jax.jit(
        lambda pp, s: codec._sig_to_toks(pp, s, None))(p, sig))
    results["pallas_wide_token_match"] = float(
        (toks_wide == np.asarray(toks0)).mean())
    print("pallas-wide token_match:",
          results["pallas_wide_token_match"], flush=True)
    os.environ.pop("ACX_PALLAS_LSTM_WIDE", None)

    # 4. token gate: does a bf16-w ENCODER LSTM flip tokens?
    def toks_with_bf16_enc_lstm(pp, s):
        import audiocodecs_tpu.models.bigcodec as bc

        orig = bc.lstm
        try:
            bc.lstm = lambda x, prm, state=None: orig(
                x, jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                                if a.ndim == 2 else a, prm), state)
            return codec._sig_to_toks(pp, s, None)
        finally:
            bc.lstm = orig

    toks_bf16 = np.asarray(jax.jit(toks_with_bf16_enc_lstm)(p, sig))
    match = float((toks_bf16 == np.asarray(toks0)).mean())
    results["bf16_enc_lstm_token_match"] = match
    print(f"bf16-w encoder-LSTM token_match: {match}", flush=True)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
