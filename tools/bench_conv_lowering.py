"""Alternative lowerings for the DAC decoder's k=7 stride-1 convs (v5e).

The per-stage roofline probe (`bench_dac_roofline.py`) shows the decoder
uniformly ~6-8x over its analytic roofline across ALL stages, and the
round-3 Pallas residual-unit kernel was end-to-end neutral — suggesting
XLA's native conv1d lowering itself is the envelope-setter. This tool
measures that claim directly on isolated stage shapes against three
MXU-friendlier algebraic rewrites of the same conv:

* ``native``   — ``lax.conv_general_dilated`` (the shipped path).
* ``shift7``   — y = sum_j shift(x, j*d) @ W[j]: seven [B*T, C] x [C, C]
  dots + adds; XLA sees plain matmuls (its best-tuned TPU path).
* ``s2d``      — space-to-depth: block the time axis by F=8 into
  [B, T/8, 8C] and run a short fat conv [kb, 8C, 8C] whose block-Toeplitz
  weight reproduces the original conv exactly (F x more FLOPs on zeros,
  but MXU-shaped 768-channel contractions).
* ``im2col``   — materialize [B, T, 7C] shifted-concat then ONE
  [7C, C] matmul (HBM-heavy, single big dot).

All rewrites compute the SAME convolution (max |dev| printed per row, on
f32 inputs with DEFAULT dots; exactness is not required — the decoder is
not token-affecting, see ``serving.py``). Shapes are DAC-44.1k decode
stages (``models/dac.py:160-185``; reference decode wrapped at
``/root/reference/audiocodecs/dac.py:93-118``).

Run (real chip): python tools/bench_conv_lowering.py [--batch 1]
    [--reps 16] [--dtype f32|bf16]
"""

import os
import sys
import time
from functools import partial

import numpy as np


def arg(name, default, cast):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


def block_toeplitz_weight(w_np, d, F):
    """[kb, F*Cin, F*Cout] block weight + left pad (in blocks) such that a
    stride-1 VALID conv over the blocked axis equals the original SAME
    k=7 dilation-d conv. Layout: blocked channel index = u*C + c."""
    K, Cin, Cout = w_np.shape
    P = (K - 1) * d // 2  # SAME pad (K odd)
    rels = [(u, j, u + j * d - P) for u in range(F) for j in range(K)]
    m0 = min(r // F for _, _, r in rels)
    m1 = max(r // F for _, _, r in rels)
    kb = m1 - m0 + 1
    wb = np.zeros((kb, F * Cin, F * Cout), w_np.dtype)
    for u, j, rel in rels:
        m, v = rel // F, rel % F
        wb[m - m0, v * Cin:(v + 1) * Cin, u * Cout:(u + 1) * Cout] += \
            w_np[j]
    return wb, -m0, m1  # left blocks of pad, right blocks of pad


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

    B = arg("--batch", 1, int)
    reps = arg("--reps", 16, int)
    scale = arg("--scale", 1, int)  # divide T (CPU smoke: --scale 64)
    dt = {"f32": jnp.float32, "bf16": jnp.bfloat16}[
        arg("--dtype", "f32", str)]
    F = 8
    prec = lax.Precision.DEFAULT

    # DAC-44.1k decode stage shapes (T at 10 s in, C of the res units).
    shapes = [
        ("stage2", 55125, 384, 1),
        ("stage3", 220500, 192, 1),
        ("stage4", 441000, 96, 1),
        ("stage4_d3", 441000, 96, 3),
        ("stage4_d9", 441000, 96, 9),
    ]

    def timed(fn, *args):
        jfn = jax.jit(partial(fn, reps=reps))
        float(jfn(*args))
        float(jfn(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(*args))
            best = min(best, time.perf_counter() - t0)
        return best / reps * 1e3

    for name, T, C, d in shapes:
        T = T // scale // F * F
        rng = np.random.default_rng(0)
        x0 = jax.device_put(
            rng.standard_normal((B, T, C)).astype(np.float32).astype(dt))
        w_np = (rng.standard_normal((7, C, C)) * 0.05).astype(np.float32)
        w = jax.device_put(w_np.astype(dt))
        P = 3 * d

        def native(x, w):
            return lax.conv_general_dilated(
                x, w, (1,), [(P, P)], rhs_dilation=(d,),
                dimension_numbers=("NHC", "HIO", "NHC"), precision=prec)

        def shift7(x, w):
            xp = jnp.pad(x, ((0, 0), (P, P), (0, 0)))
            y = jnp.einsum("btc,cd->btd", xp[:, 0:T], w[0], precision=prec)
            for j in range(1, 7):
                y += jnp.einsum("btc,cd->btd", xp[:, j * d:j * d + T],
                                w[j], precision=prec)
            return y

        wb_np, lpad, rpad = block_toeplitz_weight(w_np, d, F)
        wb = jax.device_put(wb_np.astype(dt))
        Tb = T // F

        def s2d(x, wb):
            xb = x.reshape(B, Tb, F * C)
            return lax.conv_general_dilated(
                xb, wb, (1,), [(lpad, rpad)],
                dimension_numbers=("NHC", "HIO", "NHC"),
                precision=prec).reshape(B, T, C)

        wi = jax.device_put(
            np.transpose(w_np, (0, 1, 2)).reshape(7 * C, C).astype(dt))

        def im2col(x, wi):
            xp = jnp.pad(x, ((0, 0), (P, P), (0, 0)))
            cols = jnp.concatenate(
                [xp[:, j * d:j * d + T] for j in range(7)], axis=-1)
            return jnp.einsum("btd,dc->btc", cols, wi, precision=prec)

        # correctness vs native (single shot, f32 compare)
        ref = np.asarray(jax.jit(native)(x0, w), np.float32)
        devs = {}
        for lbl, fn, ww in (("shift7", shift7, w), ("s2d", s2d, wb),
                            ("im2col", im2col, wi)):
            out = np.asarray(jax.jit(fn)(x0, ww), np.float32)
            devs[lbl] = float(np.max(np.abs(out - ref)))

        def mk_loop(fn, ww):
            def looped(x, reps):
                def body(i, x):
                    return x + fn(x, ww).astype(x.dtype) * jnp.asarray(
                        1e-3, x.dtype)
                return jnp.sum(lax.fori_loop(0, reps, body, x)
                               .astype(jnp.float32))
            return looped

        row = {"shape": f"{name} B{B} T{T} C{C} d{d} {dt.__name__}"}
        for lbl, fn, ww in (("native", native, w), ("shift7", shift7, w),
                            ("s2d", s2d, wb), ("im2col", im2col, wi)):
            row[lbl] = round(timed(mk_loop(fn, ww), x0), 2)
        row["dev"] = {k: f"{v:.2e}" for k, v in devs.items()}
        print(row, flush=True)


if __name__ == "__main__":
    main()
