"""Whisper transcription throughput (dWER metric hot path) on the real chip.

Times the full on-device dWER transcription step — log-mel frontend +
encoder + KV-cached greedy scan (``audiocodecs_tpu.nn.whisper``) — at
released architecture sizes with random weights (throughput depends on
architecture, not weight values). dWER transcribes BOTH hyp and ref, so
effective metric throughput is half the printed RTF.

Timing = bench.py methodology: scalar-fetch forced completion, warmed,
best of 3; the greedy scan itself is sequential so reps chain naturally.

Run: ``python tools/bench_whisper.py [--size base] [--batch 8] [--tokens 64]``
"""

import os
import sys
import time

import numpy as np


def arg(name, default, cast):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


# (d_model, layers, heads, ffn) per released size — vocab 51865 multilingual
SIZES = {
    "tiny": (384, 4, 6, 1536),
    "base": (512, 6, 8, 2048),
    "small": (768, 12, 12, 3072),
    "medium": (1024, 24, 16, 4096),
}


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

    from audiocodecs_tpu.nn.whisper import (
        WhisperConfig,
        init_whisper_params,
        log_mel_spectrogram,
        whisper_generate,
    )

    size = arg("--size", "base", str)
    batch = arg("--batch", 8, int)
    max_new = arg("--tokens", 64, int)
    d, nl, nh, ffn = SIZES[size]
    cfg = WhisperConfig(d_model=d, encoder_layers=nl, decoder_layers=nl,
                        encoder_heads=nh, decoder_heads=nh,
                        encoder_ffn=ffn, decoder_ffn=ffn)
    params = init_whisper_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    wav = jax.device_put(
        rng.standard_normal((batch, 480000)).astype(np.float32) * 0.05)
    print("device:", jax.devices()[0], flush=True)

    import jax.numpy as jnp2

    def make_step(decode_dtype):
        def step(p, w):
            mel = log_mel_spectrogram(w, cfg.num_mel_bins)
            toks, lengths = whisper_generate(
                p, cfg, mel, [cfg.decoder_start_token],
                max_new_tokens=max_new, decode_dtype=decode_dtype)
            return toks, lengths
        return jax.jit(step)

    audio_s = batch * 30.0
    ref_toks = None
    for label, dd in [("f32", None), ("bf16-decode", jnp.bfloat16)]:
        fn = make_step(dd)
        t0 = time.perf_counter()
        toks, _ = fn(params, wav)
        toks = np.asarray(toks)
        print(f"[{label}] compile+first: {time.perf_counter() - t0:.1f} s",
              flush=True)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp2.sum(fn(params, wav)[0]))
            best = min(best, time.perf_counter() - t0)
        match = (1.0 if ref_toks is None
                 else float((toks == ref_toks).mean()))
        if ref_toks is None:
            ref_toks = toks
        print(f"[{label}] whisper-{size} batch={batch} tokens={max_new}: "
              f"{best * 1e3:.1f} ms → {audio_s / best:.0f}x aggregate RTF "
              f"({audio_s / best / batch:.0f}x/stream; "
              f"token_match={match:.4f})")


if __name__ == "__main__":
    main()
