"""SemantiCodec component attribution (zoo floor: 14.4x/stream @B4).

The round-5 envelope (``bench_results/envelope_r5b.json``) put the
roundtrip 4.9x over its roofline (693.6 ms measured vs 141.9 ms HBM
floor; MXU floor 42.8 ms). Decode is a vendor-true LDM chain
(``models/semanticodec.py``): 50 sequential DDIM steps x a doubled-batch
(CFG) UNet call, then AutoencoderKL mel decode, then HiFi-GAN. This tool
splits the chain so the gap lands on the right stage:

  1. encode_full (AudioMAE trunk + dual VQ) / decode_full.
  2. ddim_scan alone (50 UNet steps, [2B, Tl, Fl, ed] latents).
  3. one UNet call alone (per-step cost x 50 should match 2).
  4. VAE decoder alone; HiFi-GAN vocoder alone.

Run (real chip, serialize): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/bench_semanticodec.py [--batch 4] [--seconds 10]
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np


def arg(name, default, cast=str):
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

    from audiocodecs_tpu.models.semanticodec import SemantiCodec
    from audiocodecs_tpu.nn.hifigan import apply_hifigan
    from audiocodecs_tpu.nn.ldm_unet import apply_unet
    from audiocodecs_tpu.nn.ldm_vae import apply_vae_decoder
    from audiocodecs_tpu.serving import apply_serving_preset

    B = arg("--batch", 4, int)
    seconds = arg("--seconds", 10.0, float)
    reps = arg("--reps", 2, int)
    out_path = arg("--out", "bench_results/semanticodec_split_r5.json")

    env = apply_serving_preset("semanticodec", "balanced", batch=B)
    print("preset env:", env, flush=True)

    codec = SemantiCodec(sample_rate=16000, orig_sample_rate=16000,
                         key=jax.random.PRNGKey(0))
    mc = codec.model_config
    T = int(16000 * seconds)
    rng = np.random.default_rng(0)
    sig = jax.device_put(rng.standard_normal((B, T)).astype(np.float32) * 0.1)
    p = codec.params
    results = {"batch": B, "seconds": seconds, "env": env,
               "ddim_steps": mc.ddim_steps, "timings_ms": {}}

    def timed(name, make_fn, *args, r=None):
        R = reps if r is None else r
        jfn = jax.jit(partial(make_fn, R=R))
        float(jfn(p, *args))
        float(jfn(p, *args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(jfn(p, *args))
            best = min(best, time.perf_counter() - t0)
        ms = best / R * 1e3
        results["timings_ms"][name] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        return ms

    def loop(body, pp, x0, R):
        out = x0
        for i in range(R):
            out = body(pp, out) + i * 1e-6
        return jnp.sum(out)

    # 1. full encode / decode
    def enc_body(pp, s):
        toks = codec._sig_to_toks(pp, s, None)
        return s + toks.astype(jnp.float32).mean() * 1e-6

    timed("encode_full", lambda pp, s, R: loop(enc_body, pp, s, R), sig)

    toks0 = jax.jit(codec._sig_to_toks)(p, sig, None)

    def dec_body(pp, t):
        # carry-dependent token input defeats cross-iteration CSE (the
        # bigcodec probe's decode_full was 4x under-reported without this)
        toks_dep = jnp.where(jnp.isfinite(t), toks0, 0)
        rec = codec._toks_to_sig(pp, toks_dep, None)
        return t + rec.mean() * 1e-6

    timed("decode_full", lambda pp, t, R: loop(dec_body, pp, t, R),
          jnp.zeros(()))

    # conditioning windows exactly as _windows_to_sig builds them
    cond = jax.jit(codec._toks_to_qfeats)(p, toks0, None)
    Wt = mc.tokens_per_window
    N0 = cond.shape[1]
    windows = jnp.pad(cond, ((0, 0), (0, max(0, Wt - N0)), (0, 0)),
                      constant_values=-1.0)[:, :Wt]
    print(f"windows: {windows.shape} (N0={N0}, Wt={Wt})", flush=True)

    # 2. DDIM scan alone
    def ddim_body(pp, w):
        mel = codec._ldm_ddim(pp, w, jax.random.PRNGKey(0))
        return w + mel.mean().astype(w.dtype) * 1e-6

    timed("ddim_scan", lambda pp, w, R: loop(ddim_body, pp, w, R), windows,
          r=1)

    # 3. one UNet call (doubled batch, as inside the scan)
    ucfg = mc.unet()
    ds = mc.vae_cfg.downsample_factor
    Tl, Fl = mc.window_frames // ds, mc.ldm_mel_bins // ds
    ed = mc.vae_cfg.embed_dim
    from audiocodecs_tpu.nn.layers import act_dtype

    dt = act_dtype("decoder")  # match the scan's activation dtype
    x_in = jax.device_put(rng.standard_normal(
        (2 * B, Tl, Fl, ed)).astype(np.float32) * 0.5).astype(dt)
    ctx2 = jnp.concatenate([windows, jnp.zeros_like(windows)],
                           axis=0).astype(dt)
    tt = jnp.full((2 * B,), 500.0)

    def unet_body(pp, x):
        pu = jax.tree.map(lambda a: a.astype(dt)
                          if a.dtype == jnp.float32 else a, pp["unet"])
        eps = apply_unet(pu, x, tt, ctx2, ucfg)
        return x + eps * 1e-6

    timed("unet_step", lambda pp, x, R: loop(unet_body, pp, x, R), x_in,
          r=max(reps, 4))

    # 4. VAE decoder / vocoder alone
    lat = jax.device_put(rng.standard_normal(
        (B, Tl, Fl, ed)).astype(np.float32))

    def vae_body(pp, x):
        mel = apply_vae_decoder(pp["vae"], x, mc.vae_cfg)
        return x + mel.mean() * 1e-6

    timed("vae_decoder", lambda pp, x, R: loop(vae_body, pp, x, R), lat)

    mel0 = jax.device_put(rng.standard_normal(
        (B, mc.window_frames, mc.ldm_mel_bins)).astype(np.float32))

    def voc_body(pp, m):
        w = apply_hifigan(pp["vocoder"], m, mc.vocoder_cfg)
        return m + w.mean() * 1e-6

    timed("vocoder", lambda pp, m, R: loop(voc_body, pp, m, R), mel0)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
