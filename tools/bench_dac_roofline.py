"""DAC-44.1k decoder roofline closure (VERDICT r3 item 2).

Measures per-stage decoder cost at several batch sizes and decoder modes
on the real chip, then compares each stage against its analytic roofline
(MXU matmul time vs HBM traffic time) to either locate remaining headroom
or close the "DAC batched >=50x/stream" question with arithmetic.

Stage model (decoder = conv_in -> 4x [snake -> convT k=2s -> 3 res units]
-> snake -> conv7 -> tanh, ``models/dac.py:160-185``; reference decode
path wrapped at ``/root/reference/audiocodecs/dac.py:93-118``):

* matmul FLOPs: convT = 4*Cin*Cout*T_out (k=2s taps, stride s);
  res unit = (2*7 + 2*1)*C^2*T_out = 16*C^2*T_out.
* HBM bytes (XLA-ideal: one read + one write per conv, snake/elementwise
  fused into the adjacent conv): convT = (T_in*Cin + T_out*Cout)*b;
  res unit = 5*T_out*C*b (2 convs read+write + residual-add read).
* dot passes: dec=high -> 3 bf16 passes, dec=default -> 1, bf16 acts -> 1
  (precision multipass applies to f32 operands only).

Run (real chip):  python tools/bench_dac_roofline.py --batches 1,4,8 \
    --modes dechigh,decdefault,decbf16 [--peak-tflops 394 --peak-gbs 819]
"""

import json
import os
import sys
import time


def arg(name, default, cast):
    return (cast(sys.argv[sys.argv.index(name) + 1])
            if name in sys.argv else default)


MODES = {
    # label -> (ACX_ACT_DTYPE, ACX_DEC_CONV_PRECISION, dot_passes,
    #           act_bytes, ACX_SNAKE_APPROX)
    "dechigh": ("float32", "high", 3, 4, "0"),
    "decdefault": ("float32", "default", 1, 4, "0"),
    "decbf16": ("bfloat16", "default", 1, 2, "0"),
    "dechighest": ("float32", "highest", 6, 4, "0"),
    # polynomial sin^2 snake (ACX_SNAKE_APPROX=1, decode-only, token-safe)
    "dechigh_poly": ("float32", "high", 3, 4, "1"),
    "decdefault_poly": ("float32", "default", 1, 4, "1"),
    "decbf16_poly": ("bfloat16", "default", 1, 2, "1"),
}


def analytic_stages(cfg, N):
    """[(name, T_out, flops, bytes_f32_units, snake_elems)] per stage.

    ``bytes`` is returned in *elements* (multiply by act byte width).
    """
    C0 = cfg.decoder_hidden_size
    stages = [("conv_in", N, 2 * 7 * cfg.hidden_size * C0 * N,
               N * (cfg.hidden_size + C0), 0)]
    T = N
    Cin = C0
    for i, s in enumerate(cfg.upsampling_ratios):
        Tin, T, Cout = T, T * s, Cin // 2
        flops = 4 * Cin * Cout * T + 3 * 16 * Cout * Cout * T
        elems = (Tin * Cin + T * Cout) + 3 * 5 * T * Cout
        snakes = Tin * Cin + 6 * T * Cout
        stages.append((f"stage{i+1}(C{Cout},T{T//1000}k)", T, flops, elems,
                       snakes))
        Cin = Cout
    stages.append(("head", T, 2 * 7 * Cin * T, T * (Cin + 1), T * Cin))
    return stages


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/jax_comp"))
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from audiocodecs_tpu.models.dac import DAC, dac_rvq_decode

    batches = [int(b) for b in arg("--batches", "1,4,8", str).split(",")]
    modes = arg("--modes", "dechigh,decdefault,decbf16", str).split(",")
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 8, int)
    peak_tflops = arg("--peak-tflops", 394.0, float)  # v5e bf16 MXU
    peak_gbs = arg("--peak-gbs", 819.0, float)        # v5e HBM
    sr = 44100
    T = int(sr * seconds)
    codec = DAC(sample_rate=sr, orig_sample_rate=sr, num_codebooks=9,
                key=jax.random.PRNGKey(0))
    cfg = codec.model_config
    print("device:", jax.devices()[0], flush=True)

    def slope(step, x0):
        x = step(x0)
        float(jnp.sum(jnp.asarray(x, jnp.float32)))

        def chain(R):
            t0 = time.perf_counter()
            y = x0
            for _ in range(R):
                y = step(y)
            float(jnp.sum(jnp.asarray(y, jnp.float32)))
            return time.perf_counter() - t0

        chain(reps)  # settle fresh buffers (BENCH_NOTES r3 methodology)
        t_full = chain(reps)
        t_half = chain(reps // 2)
        return (t_full - t_half) / (reps - reps // 2)

    def decoder_prefix(n_stages, with_head):
        """jit fn running conv_in + first n_stages upsample blocks."""
        import math

        from audiocodecs_tpu.models.dac import (
            _conv, _convtr, _residual_unit, snake,
        )
        from audiocodecs_tpu.nn.layers import act_dtype, conv_role

        def fn(params, q, salt):
            # chainable dependency; reduce first — the chained value is the
            # previous output of shape [B], which must not broadcast into q
            s = jnp.sum(salt)
            q = q + (s != s).astype(q.dtype)
            dt = act_dtype("decoder")
            q = q.astype(dt)
            params = jax.tree.map(lambda a: a.astype(dt), params)
            with conv_role("decoder"):
                h = _conv(q, params["conv_in"], pad=3)
                for bi in range(n_stages):
                    stride = cfg.upsampling_ratios[bi]
                    b = params["blocks"][bi]
                    h = snake(h, b["alpha_up"])
                    h = _convtr(h, b["convtr"], stride=stride,
                                pad=math.ceil(stride / 2))
                    for ri, dil in enumerate((1, 3, 9)):
                        h = _residual_unit(h, b["res"][ri], dil)
                if with_head:
                    h = snake(h, params["alpha_out"])
                    h = _conv(h, params["conv_out"], pad=3)
                    h = jnp.tanh(h)
            return h[:, 0, 0]

        return jax.jit(fn)

    for batch in batches:
        rng = np.random.default_rng(0)
        sig0 = jax.device_put(
            rng.standard_normal((batch, T)).astype(np.float32) * 0.1)
        toks = jax.jit(codec._sig_to_toks)(codec.params, sig0, None)
        q = jax.device_put(dac_rvq_decode(toks, codec.params["quantizer"]))
        N = q.shape[1]
        stages = analytic_stages(cfg, N)
        for mode in modes:
            act, prec, passes, abytes, snake_approx = MODES[mode]
            os.environ["ACX_ACT_DTYPE"] = act
            os.environ["ACX_DEC_CONV_PRECISION"] = prec
            os.environ["ACX_SNAKE_APPROX"] = snake_approx
            dparams = codec.params["decoder"]
            salt0 = jnp.zeros((), jnp.float32)
            cum = []
            configs = ([(0, False)] +
                       [(k, False) for k in range(1, 5)] + [(4, True)])
            for (k, head) in configs:
                fn = decoder_prefix(k, head)
                dt = slope(lambda s: fn(dparams, q, s).astype(jnp.float32),
                           salt0)
                cum.append(dt)
            rows = []
            for i, (name, Tout, flops, elems, snakes) in enumerate(stages):
                meas = (cum[i] - cum[i - 1]) if i else cum[0]
                mxu_ms = batch * flops * passes / (peak_tflops * 1e12) * 1e3
                hbm_ms = batch * elems * abytes / (peak_gbs * 1e9) * 1e3
                roof = max(mxu_ms, hbm_ms)
                rows.append({
                    "stage": name, "measured_ms": round(meas * 1e3, 2),
                    "mxu_ms": round(mxu_ms, 2), "hbm_ms": round(hbm_ms, 2),
                    "roofline_ms": round(roof, 2),
                    "x_over_roofline": round(meas * 1e3 / max(roof, 1e-9), 1),
                    "snake_melems": round(batch * snakes / 1e6, 1),
                })
            total = cum[-1]
            print(json.dumps({
                "batch": batch, "mode": mode,
                "decoder_total_ms": round(total * 1e3, 1),
                "roofline_total_ms": round(
                    sum(r["roofline_ms"] for r in rows), 2),
                "stages": rows,
            }), flush=True)


if __name__ == "__main__":
    main()
