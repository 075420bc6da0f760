"""Train a codec from scratch on the synthetic corpus (VQ-VAE style).

Demonstrates the full on-device training path — something the reference
cannot do at all (it only wraps frozen pretrained codecs): jitted
reconstruction+commitment training step, automatic data parallelism over
available devices, checkpointing.

    python examples/train_codec.py --steps 50 --out /tmp/codec_ckpt.npz
"""

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seconds", type=float, default=0.5)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--out", default="/tmp/codec_scratch.npz")
    p.add_argument("--num-filters", type=int, default=8)
    p.add_argument("--train-manifest", default=None,
                   help="CSV manifest (ID,duration,wav,...): train on random "
                        "crops of real corpus wavs instead of the synthetic "
                        "example signal")
    p.add_argument("--valid-manifest", default=None,
                   help="held-out manifest: report valid recon MSE + SI-SNR "
                        "at the end")
    p.add_argument("--log-every", type=int, default=0,
                   help="print a loss line every N steps (0 = 5 per run)")
    p.add_argument("--spec-weight", type=float, default=0.0,
                   help="multi-scale STFT loss weight (EnCodec-style "
                        "spectral term; 0 = waveform MSE only)")
    p.add_argument("--spec-delay", type=int, default=0,
                   help="steps before the spectral term engages "
                        "(waveform-first curriculum — engaged at step 0 "
                        "the phase-blind term traps training at a "
                        "phase-incoherent optimum)")
    p.add_argument("--spec-ramp", type=int, default=300,
                   help="steps to ramp the spectral weight in after "
                        "--spec-delay")
    p.add_argument("--cosine-decay", action="store_true",
                   help="cosine-decay the learning rate to 1%% over the run")
    args = p.parse_args(argv)

    import jax
    import numpy as np
    import optax

    from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig
    from audiocodecs_tpu.parallel.mesh import make_mesh, shard_batch
    from audiocodecs_tpu.parallel.train import (
        init_codec_opt_state,
        make_codec_train_step,
        shard_codec_params,
    )
    from audiocodecs_tpu.utils.audio import example_signal
    from audiocodecs_tpu.utils.checkpoint import save_params

    sr = 16000
    cfg = EncodecModelConfig(
        sampling_rate=sr,
        num_filters=args.num_filters,
        hidden_size=32,
        upsampling_ratios=(8, 5, 4),
        codebook_size=256,
        codebook_dim=32,
        num_quantizers=4,
    )
    codec = Encodec(sr, sr, model_config=cfg, key=jax.random.PRNGKey(0))
    mesh = make_mesh(model_parallel=1)
    params = shard_codec_params(codec.params, mesh)
    lr = (optax.cosine_decay_schedule(args.lr, max(args.steps, 1), 0.01)
          if args.cosine_decay else args.lr)
    optimizer = optax.adam(lr)
    opt_state = init_codec_opt_state(optimizer, params, num_codebooks=4)
    step = jax.jit(make_codec_train_step(cfg, num_codebooks=4,
                                         optimizer=optimizer,
                                         spec_weight=args.spec_weight,
                                         spec_delay=args.spec_delay,
                                         spec_ramp=args.spec_ramp))

    rng = np.random.default_rng(0)
    T = int(sr * args.seconds)
    recon0 = None

    def load_corpus(manifest):
        import csv

        from audiocodecs_tpu.utils.audio import read_wav

        sigs = []
        with open(manifest) as f:
            for row in csv.DictReader(f):
                sig, wav_sr = read_wav(row["wav"])
                assert wav_sr == sr, f"{row['wav']}: {wav_sr} != {sr}"
                sigs.append(np.asarray(sig, np.float32).reshape(-1))
        return sigs

    if args.train_manifest:
        corpus = load_corpus(args.train_manifest)

        def draw_batch():
            out = np.zeros((args.batch, T), np.float32)
            for b in range(args.batch):
                sig = corpus[rng.integers(len(corpus))]
                if len(sig) > T:
                    off = rng.integers(len(sig) - T + 1)
                    out[b] = sig[off:off + T]
                else:
                    out[b, :len(sig)] = sig
            return out
    else:
        base = example_signal(sr, args.seconds)

        def draw_batch():
            noise = rng.standard_normal((args.batch, T)).astype(np.float32)
            return (base[None] * rng.uniform(0.5, 1.0)
                    + 0.05 * noise).astype(np.float32)

    log_every = args.log_every or max(1, args.steps // 5)
    t0 = time.perf_counter()
    loss0 = None
    for i in range(args.steps):
        batch = shard_batch(mesh, draw_batch())
        params, opt_state, metrics = step(params, opt_state, batch)
        if i == 0:
            loss0 = float(metrics["loss"])
            recon0 = float(metrics["recon"])
        if i % log_every == 0:
            util = metrics.get("codebook_util")
            print(f"step {i}: loss={float(metrics['loss']):.4f} "
                  f"recon={float(metrics['recon']):.4f}"
                  + (f" util={float(util):.2f}" if util is not None else ""),
                  flush=True)
    dt = time.perf_counter() - t0
    if loss0 is not None:  # --steps 0: save-only smoke run
        loss1 = float(metrics["loss"])
        print(f"{args.steps} steps in {dt:.1f}s on "
              f"{jax.device_count()} device(s); "
              f"loss {loss0:.4f} -> {loss1:.4f}")

    if args.valid_manifest:
        from audiocodecs_tpu.downstream.metrics.dsp import si_snr

        trained = Encodec(sr, sr, model_config=cfg, num_codebooks=4,
                          params=jax.device_get(params))
        vals = []
        for sig in load_corpus(args.valid_manifest):
            x = np.zeros((1, T), np.float32)
            x[0, :min(len(sig), T)] = sig[:T]
            rec = trained.toks_to_sig(trained.sig_to_toks(
                jax.numpy.asarray(x)))
            vals.append(
                float(si_snr(rec[:, :T], jax.numpy.asarray(x)).mean()))
        print(f"valid SI-SNR: {np.mean(vals):+.2f} dB over {len(vals)} utts",
              flush=True)

    save_params(args.out, jax.device_get(params))
    print(f"saved {args.out}")
    # Success = reconstruction improved (total loss is NOT comparable
    # across the run when the spec curriculum changes the objective
    # mid-training).
    return 0 if (recon0 is None or float(metrics["recon"]) < recon0) else 1


if __name__ == "__main__":
    sys.exit(main())
