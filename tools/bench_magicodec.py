"""MagiCodec component attribution (zoo outlier: 2.6x/stream @B4).

Roundtrip FLOPs are tiny (~0.8 TF) yet the measured roundtrip is ~3.8 s
on v5e — 100x off the matmul roofline. Candidates, probed separately:

* patch conv (k=640, s=320, Cin=1): XLA lowers huge-kernel strided
  conv1d poorly; the reshape+matmul equivalent is pure MXU.
* unpatch conv_transpose (k=640, s=320, Cout=1): same concern, worse
  (transposed lowering).
* RoFormer stack (16 blocks, dim 1024, T=500): should be ~25 ms at
  HIGHEST dots.
* VQ over the 131072x16 codebook: one [2000,131072] matmul + argmin.

Run (real chip): python tools/bench_magicodec.py [--batch 4] [--seconds 10]
"""

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

    from audiocodecs_tpu.models.magicodec import (
        MagiCodec,
        MagiCodecModelConfig,
    )
    from audiocodecs_tpu.nn.roformer import apply_roformer
    from audiocodecs_tpu.quant.vq import vq_encode

    B = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 8, int)
    mc = MagiCodecModelConfig()
    codec = MagiCodec(sample_rate=16000, mode="reconstruct")
    T = int(16000 * seconds)
    N = T // mc.hop_length
    rng = np.random.default_rng(0)
    sig = jax.device_put(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    x = jax.device_put(
        rng.standard_normal((B, N, mc.dim)).astype(np.float32) * 0.05)
    z = jax.device_put(
        rng.standard_normal((B, N, mc.codebook_dim)).astype(np.float32))

    p = codec.params

    def timed(name, make_fn, *args):
        # params flow through jit ARGUMENTS (never closed over — the
        # remote compile tunnel rejects >~100 MB baked-constant HLO).
        jfn = jax.jit(partial(make_fn, R=reps), static_argnums=())
        float(jfn(p, *args))
        float(jfn(p, *args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(p, *args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / reps * 1e3:.2f} ms", flush=True)
        return best / reps

    def loop(body, pp, x0, R):
        out = x0
        for i in range(R):
            out = body(pp, out) + i * 1e-6  # data dep defeats memoization
        return jnp.sum(out)

    # 1. full encode (patch + roformer + proj + VQ)
    def enc_body(pp, s):
        toks = codec._sig_to_toks(pp, s, None)
        return s + toks.astype(jnp.float32).mean() * 1e-6

    timed("encode_full", lambda pp, s, R: loop(enc_body, pp, s, R), sig)

    # 2. full decode
    toks0 = jax.jit(codec._sig_to_toks)(p, sig, None)

    def dec_body(pp, t):
        rec = codec._toks_to_sig(pp, toks0, None)
        return t + rec.mean() * 1e-6

    timed("decode_full", lambda pp, t, R: loop(dec_body, pp, t, R),
          jnp.zeros(()))

    # 3. patch conv alone
    def patch_body(pp, s):
        from audiocodecs_tpu.nn.layers import conv1d, pad1d

        k = 2 * mc.hop_length
        pad = (k - mc.hop_length) // 2
        h = conv1d(pad1d(s[:, :, None], pad, pad, mode="constant"),
                   pp["patch"]["w"], pp["patch"]["b"],
                   stride=mc.hop_length)
        return s + h.mean() * 1e-6

    timed("patch_conv", lambda pp, s, R: loop(patch_body, pp, s, R), sig)

    # 4. unpatch conv_transpose alone
    def unpatch_body(pp, h):
        from audiocodecs_tpu.nn.layers import conv_transpose1d

        y = conv_transpose1d(h, pp["unpatch"]["w"], pp["unpatch"]["b"],
                             stride=mc.hop_length)
        return h + y.mean() * 1e-6

    timed("unpatch_convtr", lambda pp, h, R: loop(unpatch_body, pp, h, R),
          x)

    # 5. roformer stack alone (encoder side, depth 8)
    def rof_body(pp, h):
        return h + apply_roformer(pp["enc"], h, mc.roformer()) * 1e-6

    timed("roformer8", lambda pp, h, R: loop(rof_body, pp, h, R), x)

    # 6. VQ alone (131072 x 16 codebook)
    def vq_body(pp, zz):
        from audiocodecs_tpu.nn.layers import unit_norm

        idx = vq_encode(unit_norm(zz), unit_norm(pp["codebook"]))
        return zz + idx.astype(jnp.float32).mean()[None, None] * 1e-6

    timed("vq_131k", lambda pp, zz, R: loop(vq_body, pp, zz, R), z)


if __name__ == "__main__":
    main()
