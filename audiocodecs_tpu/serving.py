"""Per-family serving presets: the measured-fastest token-exact modes.

The precision knobs (``ACX_ACT_DTYPE``, ``ACX_CONV_PRECISION``,
``ACX_DEC_CONV_PRECISION``) trade decoder-side numerics for throughput;
tokens stay bit-exact in every preset because the ENCODER always runs
exact-f32 (decode precision cannot reach the quantizer argmin). The
winning decoder mode is family-dependent (BENCH_NOTES round 3):

* EnCodec-lineage narrow conv stacks (32–64 ch) are HBM-bound → bf16
  *activations* halve decode traffic (config #1: 193×/stream at batch 8).
* DAC-lineage wide stacks (1536→96 ch) are matmul-pass-bound → f32
  activations with fewer bf16 passes win (DAC-44.1k batch 1: 61.7×/stream
  at HIGH ≈ 8·10⁻⁵ waveform deviation, 86×/stream at DEFAULT ≈ 8·10⁻³).

Presets apply by setting the env knobs BEFORE the first jit trace of the
codec's functions (traces cache the knob values).
"""

from __future__ import annotations

import os

__all__ = ["SERVING_PRESETS", "apply_serving_preset"]

_ENCODEC_STYLE = {
    "ACX_ACT_DTYPE": "decoder-bfloat16",
    "ACX_CONV_PRECISION": "highest",
    "ACX_DEC_CONV_PRECISION": "",
    "ACX_SNAKE_APPROX": "",
    "ACX_PALLAS_DAC_RESUNIT": "",
    "ACX_PALLAS_LSTM_WIDE": "",
}
_DAC_STYLE = {
    "ACX_ACT_DTYPE": "float32",
    "ACX_CONV_PRECISION": "highest",
    "ACX_DEC_CONV_PRECISION": "high",
    "ACX_SNAKE_APPROX": "",
    # measured NEUTRAL at batch 1 (latency tier keeps XLA, BENCH_NOTES r3)
    "ACX_PALLAS_DAC_RESUNIT": "",
    "ACX_PALLAS_LSTM_WIDE": "",
}
_BIGCODEC_STYLE = {
    # DAC-lineage snake stacks, but its own tier logic: the H=1536 LSTM
    # bottlenecks dominate (4 layers = 115.7 of ~304 ms @B4, BENCH_NOTES
    # round 5). Decode-side LSTMs ride the wide Pallas recurrence (2.6x
    # faster, token-safe past the quantizer); the ENCODER LSTM stays on
    # the exact HIGHEST lax.scan (the wide kernel measured token_match
    # 0.9991 encoder-side — not shippable). The poly snake engages
    # decode-side only (same gate data as DAC: deviation inside the bf16
    # noise floor this tier already accepts).
    "ACX_ACT_DTYPE": "decoder-bfloat16",
    "ACX_CONV_PRECISION": "highest",
    "ACX_DEC_CONV_PRECISION": "",
    "ACX_SNAKE_APPROX": "1",
    "ACX_PALLAS_DAC_RESUNIT": "",
    "ACX_PALLAS_LSTM_WIDE": "decoder",
}

# family → env settings; families not listed keep the library default
# (exact f32 everywhere — always correct, never the fastest).
SERVING_PRESETS: dict[str, dict[str, str]] = {
    "encodec": _ENCODEC_STYLE,
    "mimi": _ENCODEC_STYLE,
    "past": _ENCODEC_STYLE,
    # EnCodec-style + decoder-wide LSTM: the SEANet decoder's 2-layer
    # H=1024 LSTM sits past the narrow Pallas cap (16·H² ≈ 16.8 MB >
    # Mosaic's default scoped VMEM) so it ran as lax.scan; the wide
    # kernel is decode-side-only here (the encoder BiLSTM keeps the
    # exact scan under conv_role("encoder")).
    "speechtokenizer": {**_ENCODEC_STYLE, "ACX_PALLAS_LSTM_WIDE": "decoder"},
    "hilcodec": _ENCODEC_STYLE,
    "audiodec": _ENCODEC_STYLE,
    "dac": _DAC_STYLE,
    "bigcodec": _BIGCODEC_STYLE,
    "semanticodec": _ENCODEC_STYLE,  # LDM decode: bf16 measured +18%
    # The nine families below were measured under the EnCodec-style env at
    # batch 4 with token_match 1.0 (round-4 zoo sweep — a knob-leak bug ran
    # exactly this env for every no-preset family; RTF/token_match columns
    # were valid, BENCH_NOTES round 4). StableCodec's clean A/B quantifies
    # the win: 265.1x/stream bf16-dec vs 148.2x exact-f32 (1.79x). Tokens
    # stay bit-exact by construction (encoder runs HIGHEST f32; decoder
    # activations cannot reach the quantizer argmin).
    "stablecodec": _ENCODEC_STYLE,
    "wavtokenizer": _ENCODEC_STYLE,
    "focalcodec": _ENCODEC_STYLE,
    "nanocodec": _ENCODEC_STYLE,
    "bicodec": _ENCODEC_STYLE,
    "wavlm_kmeans": _ENCODEC_STYLE,  # SEANet vocoder decode
    "xcodec2": _ENCODEC_STYLE,
    "magicodec": _ENCODEC_STYLE,
    "dycast": _ENCODEC_STYLE,
}


def apply_serving_preset(family: str, quality: str = "balanced",
                         batch: int | None = None) -> dict:
    """Set the precision env knobs for ``family``; returns what was set.

    ``quality``: ``"exact"`` = f32 everywhere (clears the knobs),
    ``"balanced"`` (default) = the measured-fastest mode whose decode
    deviation is ≤ ~1e-4, ``"fast"`` = lowest-precision decode (bf16 /
    1-pass) — tokens are bit-exact in ALL modes.

    ``batch``: expected serving batch size. DAC-lineage decode has a
    measured crossover (BENCH_NOTES round 3): matmul-pass-bound at batch
    1 (f32 acts + HIGH wins, 162 vs 226 ms) but HBM-bound at batch ≥ 4
    (bf16 activations win, 629.6 vs 807.2 ms at batch 8) — passing
    ``batch`` picks the right side; ``None`` keeps the latency-tier
    (batch-1) preset.

    Must run before the codec's first jitted call in this process (knob
    values are baked at trace time).
    """
    if quality not in ("exact", "balanced", "fast"):
        raise ValueError(
            f"quality must be exact|balanced|fast, got {quality!r}")
    if quality == "exact":
        env = {"ACX_ACT_DTYPE": "float32",
               "ACX_CONV_PRECISION": "highest",
               "ACX_DEC_CONV_PRECISION": "",
               "ACX_SNAKE_APPROX": "",
               "ACX_PALLAS_DAC_RESUNIT": "",
               "ACX_PALLAS_LSTM_WIDE": ""}
    else:
        env = dict(SERVING_PRESETS.get(family, {}))
        if not env:
            return {}
        if batch is not None and batch >= 4 \
                and SERVING_PRESETS.get(family) is _DAC_STYLE:
            # Throughput tier: bf16-act decode + polynomial snake. The
            # poly's waveform deviation (rms 1.6e-5, 0.88% of signal
            # scale) sits INSIDE the bf16-activation noise floor this
            # tier already accepts (rms 1.6e-5, 0.93%), and it is decode-
            # only so tokens stay bit-exact; measured B4 roundtrip
            # 459.5 -> 355.2 ms, +29% (bench_results/dac_poly_r5.json).
            env = dict(_ENCODEC_STYLE)
            env["ACX_SNAKE_APPROX"] = "1"
            if batch < 8:
                # fused decode-side residual unit: B4 roundtrip 355.5 ->
                # 307.0 ms (+16%), deviation at the tier's bf16 noise
                # floor (rms 1.60e-5 vs 1.58e-5), tokens bit-exact
                # (bench_results/dac_tier2_r5.json). At B8 the kernel
                # MEASURED SLOWER (467.9 -> 565.7 ms,
                # dac_tier2_b8_r5.json) — XLA keeps the B>=8 tier.
                env["ACX_PALLAS_DAC_RESUNIT"] = "1"
        if quality == "fast":
            # only DAC-style presets have a faster-still decode tier; the
            # bf16-activation decode IS the fast tier for the others (a
            # bf16 ENCODER would break token exactness — never offered)
            if env.get("ACX_DEC_CONV_PRECISION"):
                env["ACX_DEC_CONV_PRECISION"] = "default"
    for k, v in env.items():
        if v:
            os.environ[k] = v
        else:
            os.environ.pop(k, None)
    return env
