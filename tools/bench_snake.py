"""Isolate DAC decoder stage-4 component costs (v5e).

Stage 4 (C=96, T=441k) costs 29 ms but its conv matmul roofline is ~1 ms;
candidates: the snake activation's `sin` transcendentals (≈250M evals per
stage), conv overheads, transposed-conv lowering.
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
    reps = 16
    B, T, C = 1, 441000, 96
    rng = np.random.default_rng(0)
    x0 = jax.device_put(rng.standard_normal((B, T, C)).astype(np.float32))
    w7 = jax.device_put(
        rng.standard_normal((7, C, C)).astype(np.float32) * 0.05)
    alpha = jax.device_put(np.abs(rng.standard_normal((C,))).astype(
        np.float32) + 0.5)

    def timed(name, fn, *args):
        jfn = jax.jit(partial(fn, reps=reps))
        float(jfn(*args))
        float(jfn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best/reps*1e3:.2f} ms", flush=True)

    def snake_loop(x, a, reps):
        def body(i, x):
            return x + jnp.sin(a * x) ** 2 / (a + 1e-9) * 1e-3

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    def snake_bf16_loop(x, a, reps):
        def body(i, x):
            h = x.astype(jnp.bfloat16)
            s = h + (jnp.sin(a.astype(jnp.bfloat16) * h) ** 2
                     / (a.astype(jnp.bfloat16) + 1e-9)) * 1e-3
            return s.astype(jnp.float32)

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    def tanh_loop(x, a, reps):
        def body(i, x):
            return x + jnp.tanh(a * x) * 1e-3

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    def mul_loop(x, a, reps):
        def body(i, x):
            return x + (a * x) * 1e-3

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    def conv_loop(x, w, reps):
        def body(i, x):
            y = lax.conv_general_dilated(
                x, w, (1,), "SAME", dimension_numbers=("NHC", "HIO", "NHC"),
                precision=lax.Precision.DEFAULT)
            return x + y * 1e-3

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    def conv_dil9_loop(x, w, reps):
        def body(i, x):
            y = lax.conv_general_dilated(
                x, w, (1,), "SAME", rhs_dilation=(9,),
                dimension_numbers=("NHC", "HIO", "NHC"),
                precision=lax.Precision.DEFAULT)
            return x + y * 1e-3

        return jnp.sum(lax.fori_loop(0, reps, body, x))

    timed("elementwise mul (2 HBM passes)", mul_loop, x0, alpha)
    timed("snake f32", snake_loop, x0, alpha)
    timed("snake bf16-compute", snake_bf16_loop, x0, alpha)
    timed("tanh f32", tanh_loop, x0, alpha)
    timed("conv k7 C96 DEFAULT", conv_loop, x0, w7)
    timed("conv k7 d9 C96 DEFAULT", conv_dil9_loop, x0, w7)


if __name__ == "__main__":
    main()
