"""Microbench: conv layouts for narrow-channel SEANet stages on TPU.

The early EnCodec/DAC stages run C=32..64 channels over very long time
axes; XLA's native conv puts output channels in the lane dim (128), wasting
up to 75% of the MXU. Candidate: unfold K taps into the contraction and put
TIME in lanes — ``y[b,c2,t] = W[c2, k·c] · x_unf[b, k·c, t]`` — so lanes are
fully dense regardless of channel width.

Run on the real chip (ambient env): ``python tools/bench_conv_layout.py``.
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def conv_native(x, w):
    """x: [B, T, C], w: [K, C, C2] — XLA conv, VALID."""
    return lax.conv_general_dilated(
        x, w, (1,), "VALID", dimension_numbers=("NHC", "HIO", "NHC"),
        precision=lax.Precision.HIGHEST)


def conv_shifted_einsum(x, w):
    """Same math: unfold K taps, contract [K·C] with time in lanes."""
    K = w.shape[0]
    B, T, C = x.shape
    To = T - K + 1
    xt = jnp.transpose(x, (0, 2, 1))  # [B, C, T]
    x_unf = jnp.stack([xt[:, :, k : k + To] for k in range(K)], axis=1)
    x_unf = x_unf.reshape(B, K * C, To)
    wf = w.reshape(K * C, w.shape[2])  # [K·C, C2]
    y = jnp.einsum("dc,bdt->bct", wf, x_unf,
                   precision=lax.Precision.HIGHEST)
    return jnp.transpose(y, (0, 2, 1))


def timeit(fn, *args, iters=30):
    out = fn(*args)
    float(jnp.sum(out))  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(out))
    t1 = time.perf_counter()
    # slope method: subtract half-iters run
    t2 = time.perf_counter()
    for _ in range(iters // 2):
        out = fn(*args)
    float(jnp.sum(out))
    t3 = time.perf_counter()
    return ((t1 - t0) - (t3 - t2)) / (iters - iters // 2) * 1e3


def main():
    print("devices:", jax.devices())
    rng = np.random.default_rng(0)
    for C, C2, T, K in [(32, 32, 240_000, 7), (32, 64, 120_000, 4),
                        (64, 64, 120_000, 7), (64, 128, 60_000, 8),
                        (128, 128, 60_000, 7), (1, 32, 240_000, 7)]:
        B = 16
        x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
        w = jnp.asarray(
            rng.standard_normal((K, C, C2)).astype(np.float32) * 0.05)
        f_nat = jax.jit(conv_native)
        f_se = jax.jit(conv_shifted_einsum)
        y1 = f_nat(x, w)
        y2 = f_se(x, w)
        err = float(jnp.max(jnp.abs(y1 - y2)))
        t_nat = timeit(f_nat, x, w)
        t_se = timeit(f_se, x, w)
        print(f"C{C}->{C2} T{T} K{K}: native {t_nat:.2f} ms, "
              f"shifted-einsum {t_se:.2f} ms ({t_nat / t_se:.2f}x), "
              f"max|Δ|={err:.2e}")


if __name__ == "__main__":
    main()
