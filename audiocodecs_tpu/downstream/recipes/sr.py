"""Speech resynthesis evaluation (SR) — the metric-bearing entry point.

Capability parity with the reference's ``test_sr.py`` (timed encode/decode
with device sync → RTF/iRTF, 10 metrics with Rec/Ref variants, optional audio
dump, optional profiler — reference ``test_sr.py:54-167,241-335,379-391``),
re-designed for TPU: encode and decode are separately-jitted XLA programs
timed with forced completion; batches come from the static-shape bucketed
loader so the jit cache stays small.

Run:
    python -m audiocodecs_tpu.downstream.recipes.sr \
        hparams/tasks/sr.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml --output_folder /tmp/sr
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def run_sr(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.config import build_codec, dump_config
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.datasets.manifest import (
        filter_by_duration,
        read_manifest,
    )
    from audiocodecs_tpu.downstream.metrics.base import MetricStats
    from audiocodecs_tpu.downstream.metrics.codebook_util import (
        CodebookUtilization,
    )
    from audiocodecs_tpu.downstream.metrics.dsp import (
        mel_distance,
        si_snr,
        stft_distance,
    )
    from audiocodecs_tpu.downstream.metrics.stoi import stoi
    from audiocodecs_tpu.utils.audio import write_wav

    for required in ("sample_rate", "test_csv", "codec"):
        if required not in cfg:
            raise ValueError(
                f"config is missing {required!r} — did you pass all three "
                "axes (task.yaml codec.yaml dataset.yaml)?"
            )
    sample_rate = int(cfg["sample_rate"])
    out_dir = cfg.get("output_folder", "results/sr")
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, out_dir)

    rows = read_manifest(cfg["test_csv"], cfg.get("data_folder"))
    rows = filter_by_duration(
        rows, cfg.get("test_remove_if_shorter", 0.0),
        cfg.get("test_remove_if_longer", float("inf")),
    )
    loader = BucketedLoader(
        rows, sample_rate,
        batch_size=int(cfg.get("test_batch_size", 4)),
        num_buckets=int(cfg.get("num_length_buckets", 4)),
    )
    codec = build_codec(cfg, sample_rate)

    metrics = {
        "SISNR": MetricStats(lambda h, r: np.asarray(si_snr(h, r)), "SISNR"),
        "MelD": MetricStats(
            lambda h, r: np.asarray(mel_distance(h, r, sample_rate)), "MelD"
        ),
        "STFTD": MetricStats(lambda h, r: np.asarray(stft_distance(h, r)), "STFTD"),
        "STOI": MetricStats(
            lambda h, r: np.asarray(
                [stoi(np.asarray(h)[i], np.asarray(r)[i], sample_rate)
                 for i in range(len(h))]
            ),
            "STOI",
        ),
    }
    if cfg.get("speaker_encoder_checkpoint"):
        # First-party x-vector speaker similarity (reference gates this on a
        # downloaded torch model, metrics/speaker_similarity.py; here a
        # converted wavlm_xvector .npz runs the JAX encoder on-device).
        from audiocodecs_tpu.downstream.metrics.external import (
            make_speaker_similarity_metric,
        )

        spk = make_speaker_similarity_metric(
            checkpoint=cfg["speaker_encoder_checkpoint"],
            config=cfg.get("speaker_encoder_config"),
        )
        metrics["SpkSim"] = MetricStats(
            lambda h, r: spk.metric(np.asarray(h), np.asarray(r),
                                    sample_rate),
            "SpkSim",
        )
    cbu = CodebookUtilization(codec.config.num_codebooks, codec.config.vocab_size)

    encode_time = decode_time = real_time = 0.0
    dump_audio = bool(cfg.get("save_audios", False))
    audio_dir = os.path.join(out_dir, "audios")
    if dump_audio:
        os.makedirs(audio_dir, exist_ok=True)

    n_batches = 0
    for batch in loader:
        sig = jnp.asarray(batch["sig"])
        length = jnp.asarray(batch["length"])

        t0 = time.perf_counter()
        toks = codec.sig_to_toks(sig, length)
        jax.block_until_ready(toks)
        _ = int(np.asarray(toks[0, 0, 0]))  # force full completion
        encode_time += time.perf_counter() - t0

        t0 = time.perf_counter()
        rec = codec.toks_to_sig(toks, length)
        jax.block_until_ready(rec)
        _ = float(np.asarray(rec[0, 0]))
        decode_time += time.perf_counter() - t0

        real_time += float(np.sum(np.asarray(length)) * sig.shape[1]) / sample_rate

        # length reconciliation: replicate-pad / trim (reference
        # test_sr.py:90-100)
        rec_np = np.asarray(rec)
        sig_np = np.asarray(batch["sig"])
        if rec_np.shape[1] < sig_np.shape[1]:
            pad = sig_np.shape[1] - rec_np.shape[1]
            rec_np = np.concatenate(
                [rec_np, np.repeat(rec_np[:, -1:], pad, axis=1)], axis=1
            )
        rec_np = rec_np[:, : sig_np.shape[1]]

        ids = batch["ids"]
        for m in metrics.values():
            m.append(ids, jnp.asarray(rec_np), jnp.asarray(sig_np))
        cbu.append(np.asarray(toks), np.asarray(batch["length"]))

        if dump_audio:
            for i, uid in enumerate(ids):
                n = int(float(batch["length"][i]) * sig_np.shape[1])
                write_wav(os.path.join(audio_dir, f"{uid}_rec.wav"),
                          rec_np[i, :n], sample_rate)
                write_wav(os.path.join(audio_dir, f"{uid}_in.wav"),
                          sig_np[i, :n], sample_rate)
        n_batches += 1

    summary = {name: m.summarize("average") for name, m in metrics.items()}
    summary.update(
        {
            "RealTime": real_time,
            "ProcessTimeEncode": encode_time,
            "ProcessTimeDecode": decode_time,
            "RTF": (encode_time + decode_time) / max(real_time, 1e-9),
            "iRTF": real_time / max(encode_time + decode_time, 1e-9),
            "num_batches": n_batches,
            "codebook_util": cbu.summarize("avg_utilization"),
            "norm_entropy": cbu.summarize("avg_norm_entropy"),
        }
    )

    if cfg.get("use_profiler", False):
        from audiocodecs_tpu.downstream.profiler import format_report, profile_codec

        prof = profile_codec(
            codec, seconds=cfg.get("profiler_seconds", (1, 2, 4)), batch=1,
        )
        summary["profiler"] = {
            k: v for k, v in prof.items() if not isinstance(v, dict)
        }
        with open(os.path.join(out_dir, "profiler.txt"), "w") as f:
            f.write(format_report(prof))

    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for name, m in metrics.items():
        m.write_stats(os.path.join(out_dir, f"{name.lower()}.txt"))
    return summary


def main(argv=None):
    from audiocodecs_tpu.downstream.config import parse_cli
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg, _ = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = prepare_data(cfg)
    summary = run_sr(cfg)
    print(json.dumps(summary, indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
