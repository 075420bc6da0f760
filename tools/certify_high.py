"""Per-frame token-safety certification of the fast encoder precision.

Runs the SAME EnCodec encoder twice — exact (HIGHEST, 6-pass f32-equivalent)
and fast (``--prec high``, 3-pass) — and applies the sound RVQ certificate
(:mod:`audiocodecs_tpu.quant.certify`): a certified frame PROVABLY yields
identical tokens under the fast path; uncertified frames are checked
empirically. Turns BENCH_NOTES' measured ~0.9998 token match into a
per-signal proof artifact.

    python tools/certify_high.py [--batch 4] [--seconds 10] [--prec high]
                                 [--checkpoint params.npz]

Prints one JSON line: {"certified": f, "equal": f, "max_delta": d, ...}.
"""

from __future__ import annotations

import json
import os
import sys


def arg(name, default, cast=str):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


def main() -> int:
    batch = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    prec = arg("--prec", "high")
    ckpt = arg("--checkpoint", None)
    family = arg("--codec", "encodec")

    import numpy as np

    import jax
    import jax.numpy as jnp

    from audiocodecs_tpu.quant.certify import (
        certify_dac_tokens,
        certify_mimi_tokens,
        certify_rvq_tokens,
    )

    kwargs = {}
    if ckpt:
        from audiocodecs_tpu.utils.checkpoint import load_params

        kwargs["params"] = load_params(ckpt)
    if family == "dac":
        from audiocodecs_tpu.models.dac import DAC

        sr = 44100
        codec = DAC(sr, sr, num_codebooks=9, key=jax.random.PRNGKey(0),
                    **kwargs)
    elif family == "mimi":
        from audiocodecs_tpu.models.mimi import Mimi

        sr = 24000
        codec = Mimi(sr, num_codebooks=8, key=jax.random.PRNGKey(0),
                     **kwargs)
    else:
        from audiocodecs_tpu.models.encodec import Encodec

        sr = 24000
        codec = Encodec(sr, sr, num_codebooks=8,
                        key=jax.random.PRNGKey(0), **kwargs)
    T = int(sr * seconds)
    rng = np.random.default_rng(0)
    t = np.arange(T) / float(sr)
    sig = np.stack([
        (0.5 * np.sin(2 * np.pi * (180 + 60 * b) * t)
         + 0.1 * rng.standard_normal(T)).astype(np.float32)
        for b in range(batch)
    ])
    sig = jnp.asarray(sig)

    feats_fn = (codec._encode_feats if family == "dac"
                else codec._sig_to_feats)

    def trace_feats(precision: str):
        # conv precision is read from the env at TRACE time; a fresh jit
        # wrapper per setting captures it
        old = os.environ.get("ACX_CONV_PRECISION")
        os.environ["ACX_CONV_PRECISION"] = precision
        try:
            fn = jax.jit(lambda p, s: feats_fn(p, s, None))
            out = fn(codec.params, sig)
            out.block_until_ready()
        finally:
            if old is None:
                os.environ.pop("ACX_CONV_PRECISION", None)
            else:
                os.environ["ACX_CONV_PRECISION"] = old
        return out

    def trace_toks(precision: str):
        old = os.environ.get("ACX_CONV_PRECISION")
        os.environ["ACX_CONV_PRECISION"] = precision
        try:
            fn = jax.jit(lambda p, s: codec._sig_to_toks(p, s, None))
            out = fn(codec.params, sig)
            out.block_until_ready()
        finally:
            if old is None:
                os.environ.pop("ACX_CONV_PRECISION", None)
            else:
                os.environ["ACX_CONV_PRECISION"] = old
        return np.asarray(out)

    z_exact = trace_feats("highest")
    z_fast = trace_feats(prec)
    # ground truth: the ACTUAL encoder's token grids under both precisions
    toks_exact = trace_toks("highest")
    toks_fast = trace_toks(prec)
    real_match = np.all(toks_exact == toks_fast, axis=-1)  # [B, N]
    if family == "dac":
        certified, equal, delta = certify_dac_tokens(
            z_exact, z_fast, codec.params["quantizer"],
            codec.config.num_codebooks)
    elif family == "mimi":
        certified, equal, delta = certify_mimi_tokens(
            z_exact, z_fast, codec.params["quantizer"],
            codec.config.num_codebooks,
            codec.model_config.num_semantic_quantizers)
    else:
        certified, equal, delta = certify_rvq_tokens(
            z_exact, z_fast, codec.params["codebooks"],
            codec.config.num_codebooks)
    n = certified.size
    print(json.dumps({
        "codec": family, "prec": prec,
        "frames": int(n),
        "certified": round(float(jnp.mean(certified)), 6),
        "equal": round(float(jnp.mean(equal)), 6),
        "uncertified_but_equal": round(
            float(jnp.mean(~certified & equal)), 6),
        "mismatch": round(float(jnp.mean(~equal)), 6),
        "real_token_match": round(float(np.mean(real_match)), 6),
        "certified_but_real_mismatch": round(
            float(np.mean(np.asarray(certified) & ~real_match)), 6),
        "max_delta": float(jnp.max(delta)),
        "backend": jax.default_backend(),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
