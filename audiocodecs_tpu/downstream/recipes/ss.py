"""Speech separation (SS): mixture tokens → per-speaker token grids with PIT.

Capability parity with the reference's ``train_ss.py`` (head predicts S×K
codebooks; permutation-invariant CE with reordering; per-speaker vocode +
metrics — reference ``train_ss.py:46-51,144-176,196-230``). PIT here is a
vectorized min over the S! permutations of per-speaker CE (S=2 by default),
computed inside the jitted loss.

Run:
    python -m audiocodecs_tpu.downstream.recipes.ss \
        hparams/tasks/ss.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml
"""

from __future__ import annotations

import itertools
import json
import os
import sys

import numpy as np


def ss_forward(params, toks, cfg_t, *, vocab_size, num_codebooks, num_speakers):
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.models.multihead import (
        multihead_embed,
        multihead_logits,
    )
    from audiocodecs_tpu.downstream.models.pooling import weighted_pooling
    from audiocodecs_tpu.nn.transformer import apply_transformer

    x = multihead_embed(params["embedding"], toks, vocab_size=vocab_size)
    x = weighted_pooling(params["pool"], x)
    x = apply_transformer(params["encoder"], x, cfg_t)
    head_vocab = (tuple(vocab_size) * num_speakers
                  if isinstance(vocab_size, (list, tuple)) else vocab_size)
    logits = multihead_logits(params["head"], x,
                              num_heads=num_speakers * num_codebooks,
                              vocab_size=head_vocab)
    B, N = logits.shape[:2]
    return logits.reshape(B, N, num_speakers, num_codebooks, -1)


def run_ss(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from audiocodecs_tpu.downstream.config import build_codec, dump_config
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.metrics.dsp import si_snr
    from audiocodecs_tpu.downstream.models.multihead import (
        init_multihead_embedding,
        init_multihead_linear,
    )
    from audiocodecs_tpu.downstream.models.pooling import init_weighted_pooling
    from audiocodecs_tpu.downstream.recipes.trainer import (
        Trainer,
        trainer_kwargs,
    )
    from audiocodecs_tpu.nn.transformer import (
        TransformerConfig,
        init_transformer_params,
    )
    from audiocodecs_tpu.utils.audio import read_wav
    from audiocodecs_tpu.utils.masking import length_mask

    sample_rate = int(cfg["sample_rate"])
    S = int(cfg.get("num_speakers", 2))
    out_dir = cfg.get("output_folder", "results/ss")
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, out_dir)

    from audiocodecs_tpu.downstream.recipes.common import (
        loader_kwargs,
        read_split_manifests,
    )

    rows = read_split_manifests(cfg)
    codec = build_codec(cfg, sample_rate)
    from audiocodecs_tpu.downstream.recipes.common import vocab_spec

    K, C = codec.config.num_codebooks, vocab_spec(codec)

    d_model = int(cfg.get("d_model", 256))
    cfg_t = TransformerConfig(
        hidden_size=d_model,
        num_layers=int(cfg.get("num_layers", 4)),
        num_heads=int(cfg.get("num_heads", 4)),
        num_kv_heads=int(cfg.get("num_heads", 4)),
        head_dim=d_model // int(cfg.get("num_heads", 4)),
        intermediate_size=int(cfg.get("ffn_dim", 1024)),
        act="gelu", norm="layernorm", causal=False,
    )
    key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "embedding": init_multihead_embedding(k1, K, C, d_model),
        "pool": init_weighted_pooling(k1, K),
        "encoder": init_transformer_params(k2, cfg_t),
        "head": init_multihead_linear(
            k3, d_model, S * K,
            tuple(C) * S if isinstance(C, (list, tuple)) else C),
    }

    src_fields = ["wav", "src2_wav"][:S]
    perms = list(itertools.permutations(range(S)))

    def encode_batch(batch):
        """Encode mixture + all sources in one codec call."""
        mix = batch["sig"]
        B, T = mix.shape
        srcs = np.zeros((S, B, T), np.float32)
        for i, r in enumerate(batch["rows"]):
            for s, field in enumerate(src_fields):
                w, _ = read_wav(r[field])
                n = min(len(w[0]), T)
                srcs[s, i, :n] = w[0][:n]
        stacked = np.concatenate([mix] + [srcs[s] for s in range(S)], axis=0)
        lens = np.tile(batch["length"], S + 1)
        toks = np.asarray(
            codec.sig_to_toks(jnp.asarray(stacked), jnp.asarray(lens))
        )
        mix_toks = toks[:B]
        src_toks = toks[B:].reshape(S, B, *toks.shape[1:]).transpose(1, 0, 2, 3)
        return mix_toks, src_toks, srcs  # [B,N,K], [B,S,N,K], [S,B,T]

    def loss_fn(params, batch, key):
        logits = ss_forward(params, batch["mix_toks"], cfg_t, vocab_size=C,
                            num_codebooks=K, num_speakers=S)  # [B,N,S,K,C]
        tgt = batch["src_toks"]  # [B, S, N, K]
        mask = length_mask(batch["length"], logits.shape[1])[..., None]  # [B,N,1]
        per_pair = []
        for s_pred in range(S):
            row = []
            for s_tgt in range(S):
                ce = optax.softmax_cross_entropy_with_integer_labels(
                    logits[:, :, s_pred], tgt[:, s_tgt]
                )  # [B, N, K]
                row.append((ce * mask).sum((1, 2)) / jnp.maximum(
                    mask.sum((1, 2)) * K, 1.0))
            per_pair.append(jnp.stack(row, -1))
        cost = jnp.stack(per_pair, -2)  # [B, S_pred, S_tgt]
        perm_losses = jnp.stack(
            [sum(cost[:, i, p[i]] for i in range(S)) / S for p in perms], -1
        )  # [B, n_perms]
        return perm_losses.min(-1).mean(), {}

    def make_batches(split, shuffle, with_audio=False):
        def gen():
            loader = BucketedLoader(
                rows[split], sample_rate,
                shuffle=shuffle, seed=int(cfg.get("seed", 0)),
                read_fn=lambda r: read_wav(r["mix_wav"])[0][0],
                **loader_kwargs(cfg),
            )
            for batch in loader:
                mix_toks, src_toks, srcs = encode_batch(batch)
                out = {
                    "mix_toks": jnp.asarray(mix_toks),
                    "src_toks": jnp.asarray(src_toks),
                    "length": jnp.asarray(batch["length"]),
                }
                if with_audio:
                    out["srcs"] = srcs
                    out["ids"] = batch["ids"]
                yield out
        return gen

    eval_loss = jax.jit(lambda p, b: loss_fn(p, b, None)[0])

    def pit_loss_of(params, split):
        tot, n = 0.0, 0
        for batch in make_batches(split, False)():
            tot += float(eval_loss(params, batch))
            n += 1
        return tot / max(n, 1)

    trainer = Trainer(loss_fn, params, lr=float(cfg.get("lr", 1e-3)),
                      output_folder=out_dir, **trainer_kwargs(cfg))
    trainer.fit(
        int(cfg.get("epochs", 5)),
        make_batches("train", True),
        valid_fn=lambda p: pit_loss_of(p, "valid"),
    )
    params = trainer.load_checkpoint("best")

    @jax.jit
    def separate(params, mix_toks):
        logits = ss_forward(params, mix_toks, cfg_t, vocab_size=C,
                            num_codebooks=K, num_speakers=S)
        return jnp.argmax(logits, -1).astype(jnp.int32)  # [B, N, S, K]

    # Test: vocode each speaker, best-permutation SI-SNR + the per-speaker
    # quality battery on the best-permutation pairing (reference
    # train_ss.py:225-234 scores every speaker stream with UTMOS/DNSMOS/
    # STOI/PESQ/MelD/STFTD/dWER/SpkSim vs its source)
    from audiocodecs_tpu.downstream.recipes.quality import PairBattery

    battery = PairBattery(cfg, sample_rate)
    sisnrs = []
    for batch in make_batches("test", False, with_audio=True)():
        pred = np.asarray(separate(params, batch["mix_toks"]))  # [B,N,S,K]
        B = pred.shape[0]
        est = []
        for s in range(S):
            est.append(np.asarray(
                codec.toks_to_sig(jnp.asarray(pred[:, :, s]))
            ))
        T = min(min(e.shape[1] for e in est), batch["srcs"].shape[2])
        for b in range(B):
            best, best_perm = -np.inf, perms[0]
            for p in perms:
                score = float(np.mean([
                    float(si_snr(jnp.asarray(est[i][b, :T][None]),
                                 jnp.asarray(batch["srcs"][p[i], b, :T][None]))[0])
                    for i in range(S)
                ]))
                if score > best:
                    best, best_perm = score, p
            sisnrs.append(best)
            for i in range(S):
                battery.score_pair(est[i][b, :T],
                                   batch["srcs"][best_perm[i], b, :T],
                                   uid=f"{batch['ids'][b]}_{i}")
    summary = {
        "test_PIT_loss": pit_loss_of(params, "test"),
        "test_SISNR_pit": float(np.mean(sisnrs)) if sisnrs else float("nan"),
    }
    summary.update(battery.summary())
    battery.write_stats(out_dir)
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    from audiocodecs_tpu.downstream.config import parse_cli
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg, _ = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = prepare_data(cfg)
    print(json.dumps(run_ss(cfg), indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
