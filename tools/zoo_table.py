"""Render a bench_zoo JSON as a markdown table (BENCH_NOTES / RESULTS).

    python tools/zoo_table.py runs/bench/zoo_r4.json [more.json ...]

Later files override earlier per family (e.g. a re-bench after a perf
fix). Sorted by per-stream RTF, errors listed last.
"""

import json
import sys


def main():
    fams = {}
    meta = {}
    for path in sys.argv[1:]:
        with open(path) as f:
            d = json.load(f)
        meta = {k: d.get(k) for k in ("preset", "batch", "seconds")}
        fams.update(d.get("families", {}))
    ok = {k: v for k, v in fams.items() if "rtf_aggregate" in v}
    bad = {k: v for k, v in fams.items() if "rtf_aggregate" not in v}
    print(f"| family | per-stream RTF | aggregate | roundtrip ms | sr | "
          f"token_match | mode |")
    print("|---|---|---|---|---|---|---|")
    for k, v in sorted(ok.items(), key=lambda kv: -kv[1]["rtf_per_stream"]):
        env = v.get("env") or {}
        mode = ("bf16-dec" if env.get("ACX_ACT_DTYPE") == "decoder-bfloat16"
                else "HIGH-dec" if env.get("ACX_DEC_CONV_PRECISION") == "high"
                else "exact-f32")
        print(f"| {k} | **{v['rtf_per_stream']}×** | {v['rtf_aggregate']}× "
              f"| {v['roundtrip_ms']} | {v['sample_rate']} "
              f"| {v['token_match']:.4f} | {mode} |")
    for k, v in bad.items():
        print(f"| {k} | — | — | — | — | — | ERROR: {v.get('error')} |")
    if meta:
        print(f"\n(batch {meta.get('batch')} × {meta.get('seconds')} s, "
              f"preset '{meta.get('preset')}', v5e via tunnel)")


if __name__ == "__main__":
    main()
