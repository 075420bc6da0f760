"""Roofline envelopes for the sub-50x/stream zoo families (VERDICT r4 #4).

For each family: compile encode + decode at the zoo-bench shape (batch 4
x 10 s) under the SAME serving preset the zoo sweep used, pull XLA's
compile-time cost analysis (flops, bytes accessed), and turn it into a
speed-of-light envelope on v5e:

    t_mxu >= flops / PEAK_FLOPS      (generous: bf16 peak, even for f32)
    t_hbm >= bytes  / HBM_BW
    envelope_ms = max(t_mxu, t_hbm)

`measured_over_envelope` = measured roundtrip ms (from the zoo sweep
JSON) / envelope_ms. A ratio within a small factor of 1 means the family
is roofline-bound at its architecture's cost — the honest closure for a
family under 50x/stream; a large ratio means headroom (a lowering bug or
a missing fusion), i.e. optimize instead of writing an envelope.

Run (serialize with other TPU jobs; ambient JAX_PLATFORMS=axon):

    PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_envelope.py \
        --families xcodec2,bicodec,bigcodec,nanocodec,semanticodec \
        [--zoo bench_results/zoo_r4.json,bench_results/zoo_r5.json] \
        [--out bench_results/envelope_r5.json] [--batch 4] [--seconds 10]

The reference has no counterpart — its wrapped decoders are whatever the
vendor ships (e.g. /root/reference/audiocodecs/bigcodec.py:64-118); the
envelope discipline exists because this framework claims speed-of-light
serving, so every sub-50x family needs either arithmetic or a fix.
"""

import json
import os
import sys
from functools import partial

import numpy as np

# TPU v5e (v5 lite) single-chip peaks (public spec: 197 bf16 TFLOP/s,
# 16 GB HBM @ 819 GB/s).
PEAK_FLOPS = 197e12
HBM_BW = 819e9

_KNOBS = ("ACX_ACT_DTYPE", "ACX_CONV_PRECISION", "ACX_DEC_CONV_PRECISION",
          "ACX_SNAKE_APPROX", "ACX_PALLAS_DAC_RESUNIT")


def arg(name, default, cast=str):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


def _cost(fn, *args):
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    cost = compiled.cost_analysis() or {}
    if isinstance(cost, (list, tuple)):  # some backends wrap in a list
        cost = cost[0] if cost else {}
    return {
        "gflops": float(cost.get("flops", 0.0)) / 1e9,
        "bytes_accessed_gb": float(cost.get("bytes accessed", 0.0)) / 1e9,
    }


def analyze_family(name, batch, seconds):
    import jax

    from audiocodecs_tpu.models import get_codec_class
    from audiocodecs_tpu.serving import apply_serving_preset

    for k in _KNOBS:
        os.environ.pop(k, None)
    env_set = apply_serving_preset(name, "balanced", batch=batch)
    cls = get_codec_class(name)
    codec = cls(sample_rate=getattr(cls, "DEFAULT_ORIG_SR", 16000),
                mode="reconstruct")
    sr = codec.config.orig_sample_rate
    T = int(sr * seconds)
    sig = jax.device_put(np.random.default_rng(0)
                         .standard_normal((batch, T)).astype(np.float32)
                         * 0.1)

    param_bytes = sum(
        int(np.prod(np.shape(p))) * np.dtype(
            getattr(p, "dtype", np.float32)).itemsize
        for p in jax.tree_util.tree_leaves(codec.params))

    enc = _cost(lambda p, s: codec._sig_to_toks(p, s, None),
                codec.params, sig)
    toks = jax.jit(lambda p, s: codec._sig_to_toks(p, s, None))(
        codec.params, sig)
    dec = _cost(lambda p, t: codec._toks_to_sig(p, t, None),
                codec.params, toks)

    flops = (enc["gflops"] + dec["gflops"]) * 1e9
    bytes_moved = (enc["bytes_accessed_gb"] + dec["bytes_accessed_gb"]) * 1e9
    t_mxu_ms = flops / PEAK_FLOPS * 1e3
    t_hbm_ms = bytes_moved / HBM_BW * 1e3
    return {
        "sample_rate": sr,
        "batch": batch,
        "seconds": seconds,
        "env": env_set,
        "param_bytes_mb": param_bytes / 1e6,
        "encode": enc,
        "decode": dec,
        "roundtrip_gflops": flops / 1e9,
        "roundtrip_bytes_gb": bytes_moved / 1e9,
        "t_mxu_ms": t_mxu_ms,
        "t_hbm_ms": t_hbm_ms,
        "envelope_ms": max(t_mxu_ms, t_hbm_ms),
        "bound": "mxu" if t_mxu_ms >= t_hbm_ms else "hbm",
    }


def main():
    fams = arg("--families",
               "xcodec2,bicodec,bigcodec,nanocodec,semanticodec").split(",")
    batch = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    out_path = arg("--out", "bench_results/envelope_r5.json")
    zoo_paths = arg(
        "--zoo", "bench_results/zoo_r5.json,bench_results/zoo_r4.json"
    ).split(",")

    measured = {}
    for zp in reversed(zoo_paths):  # later paths lower priority
        if os.path.exists(zp):
            for fam, row in json.load(open(zp)).get("families", {}).items():
                if "roundtrip_ms" in row:
                    measured[fam] = row

    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    results = {}
    for fam in fams:
        fam = fam.strip()
        print(f"== {fam}", flush=True)
        try:
            row = analyze_family(fam, batch, seconds)
        except Exception as e:  # tunnel hiccup: record and continue
            results[fam] = {"error": f"{type(e).__name__}: {e}"}
            print(f"  ERROR {e}", flush=True)
            continue
        m = measured.get(fam, {})
        if m.get("roundtrip_ms"):
            row["measured_ms"] = m["roundtrip_ms"]
            row["measured_rtf_per_stream"] = m.get("rtf_per_stream")
            row["measured_over_envelope"] = (
                m["roundtrip_ms"] / row["envelope_ms"])
        results[fam] = row
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"peak_flops": PEAK_FLOPS, "hbm_bw": HBM_BW,
                       "families": results}, f, indent=1)
        print(f"  {row['roundtrip_gflops']:.1f} GFLOP, "
              f"{row['roundtrip_bytes_gb']:.2f} GB moved, "
              f"envelope {row['envelope_ms']:.1f} ms ({row['bound']}), "
              f"measured {m.get('roundtrip_ms', float('nan')):.1f} ms "
              f"-> x{row.get('measured_over_envelope', float('nan')):.1f}",
              flush=True)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
