"""Microbench: batch-packed grouped conv vs native batched conv (v5e).

Hypothesis (VERDICT round-2 idea #10): at C≤64 the native layout wastes
most of the 128 output lanes; folding BATCH into the channel axis
([B,T,C] → [1,T,B·C], kernel tiled into B groups) fills the lanes without
the time-axis transposes that sank the unfold experiment.

Run: ``python tools/bench_batch_pack.py``
"""

import os
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    print("device:", jax.devices()[0], flush=True)

    def native(x, w, reps):
        C = x.shape[-1]

        def body(i, x):
            y = lax.conv_general_dilated(
                x, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
                precision=lax.Precision.HIGHEST)
            return y[..., :C] + i * 1e-9  # keep carry shape

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    def packed(xp, wp, B, C, reps):
        Cout = wp.shape[-1] // B

        def body(i, xp):
            y = lax.conv_general_dilated(
                xp, wp, (1,), "SAME",
                dimension_numbers=("NHC", "HIO", "NHC"),
                feature_group_count=B,
                precision=lax.Precision.HIGHEST)
            if Cout != C:  # slice each group back to C channels
                y = y.reshape(y.shape[0], y.shape[1], B, Cout)[..., :C]
                y = y.reshape(y.shape[0], y.shape[1], B * C)
            return y + i * 1e-9

        return jnp.sum(lax.fori_loop(0, reps, body, xp))

    reps = 16
    for B, C, T, K in ((8, 32, 240000, 7), (8, 64, 120000, 7),
                       (16, 32, 240000, 7), (8, 1, 240000, 7),
                       (8, 96, 441000, 7), (8, 128, 60000, 7)):
        rng = np.random.default_rng(0)
        x = jax.device_put(rng.standard_normal((B, T, C)).astype(np.float32))
        w = jax.device_put(
            rng.standard_normal((K, C, max(C, 8))).astype(np.float32) * 0.1)
        Cout = max(C, 8)
        xp = jnp.transpose(x, (1, 0, 2)).reshape(1, T, B * C)
        wp = jnp.tile(w, (1, 1, B))

        fn_n = jax.jit(partial(native, reps=reps))
        fn_p = jax.jit(partial(packed, B=B, C=C, reps=reps))

        float(fn_n(x, w)); float(fn_n(x, w))
        best_n = min(
            (lambda t0: (float(fn_n(x, w)), time.perf_counter() - t0)[1])(
                time.perf_counter()) for _ in range(3))
        float(fn_p(xp, wp)); float(fn_p(xp, wp))
        best_p = min(
            (lambda t0: (float(fn_p(xp, wp)), time.perf_counter() - t0)[1])(
                time.perf_counter()) for _ in range(3))
        print(f"B{B} C{C}->{Cout} T{T} K{K}: native "
              f"{best_n/reps*1e3:.2f} ms, packed {best_p/reps*1e3:.2f} ms "
              f"({best_n/best_p:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
