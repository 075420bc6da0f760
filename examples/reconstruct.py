"""Quickstart CLI: waveform → tokens → waveform.

TPU-native equivalent of the reference quickstart (reference
``README.md:69-80``: build a codec, ``sig_to_toks``, ``toks_to_sig``).

    python examples/reconstruct.py --codec encodec --out /tmp/rec.wav
    python examples/reconstruct.py --in speech.wav --num-codebooks 4
"""

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--codec", default="encodec", help="registry name (encodec, ...)")
    p.add_argument("--in", dest="inp", default=None, help="input wav (default: synthetic)")
    p.add_argument("--out", default="reconstruction.wav")
    p.add_argument("--num-codebooks", type=int, default=8)
    p.add_argument("--sample-rate", type=int, default=24000,
                   help="I/O sample rate (resampled to the codec's native rate)")
    p.add_argument("--checkpoint", default=None,
                   help="converted params .npz (default: random init)")
    args = p.parse_args(argv)

    import jax
    import numpy as np

    from audiocodecs_tpu.models import get_codec_class
    from audiocodecs_tpu.utils.audio import example_signal, read_wav, write_wav

    if args.inp:
        sig_np, sr = read_wav(args.inp)
        sig_np = sig_np[:1]  # mono
        args.sample_rate = sr
    else:
        sig_np = example_signal(args.sample_rate, 1.0)[None]

    cls = get_codec_class(args.codec)
    kwargs = {}
    if args.checkpoint:
        from audiocodecs_tpu.utils.checkpoint import load_params

        kwargs["params"] = load_params(args.checkpoint)
    codec = cls(
        sample_rate=args.sample_rate,
        num_codebooks=args.num_codebooks,
        **kwargs,
    )

    sig = jax.device_put(sig_np.astype(np.float32))
    t0 = time.perf_counter()
    toks = codec.sig_to_toks(sig)
    rec = codec.toks_to_sig(toks)
    rec.block_until_ready()
    dt = time.perf_counter() - t0

    rec_np = np.asarray(rec)
    write_wav(args.out, rec_np, args.sample_rate)
    dur = sig_np.shape[-1] / args.sample_rate
    print(
        f"{args.codec}: {sig_np.shape} @ {args.sample_rate} Hz -> tokens {tuple(toks.shape)}"
        f" -> {rec_np.shape} ({dt:.2f}s incl. compile, {dur / dt:.1f}x realtime)"
    )
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
