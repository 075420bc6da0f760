"""ASR recipe: CTC over codec tokens.

Capability parity with the reference's ``train_asr.py`` (BiLSTM encoder over
pooled token embeddings → CTC loss → greedy decode → WER/CER, char
tokenizer, embedding pretraining from ``codec.embs()``, token cache, token→
char frequency matrix — reference ``train_asr.py:40-198,235-238``).

Run:
    python -m audiocodecs_tpu.downstream.recipes.asr \
        hparams/tasks/asr.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml
"""

from __future__ import annotations

import itertools
import json
import os
import sys

import numpy as np


def masked_flip(x, length):
    """Reverse each sequence within its valid length (for the backward LSTM)."""
    import jax.numpy as jnp

    B, N = x.shape[:2]
    abs_len = jnp.round(length * N).astype(jnp.int32)  # [B]
    idx = jnp.arange(N)[None, :]
    src = jnp.where(idx < abs_len[:, None], abs_len[:, None] - 1 - idx, idx)
    return jnp.take_along_axis(x, src[..., None], axis=1)


def asr_forward(params, toks, length, *, vocab_size):
    """``toks`` [B, N, K] → CTC logits [B, N, num_chars]."""
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.models.multihead import multihead_embed
    from audiocodecs_tpu.downstream.models.pooling import weighted_pooling
    from audiocodecs_tpu.nn.lstm import lstm

    x = multihead_embed(params["embedding"], toks, vocab_size=vocab_size)
    x = weighted_pooling(params["pool"], x)
    fwd, _ = lstm(x, params["lstm_fwd"])
    bwd, _ = lstm(masked_flip(x, length), params["lstm_bwd"])
    bwd = masked_flip(bwd, length)
    y = jnp.concatenate([fwd, bwd], axis=-1)
    return y @ params["head"]["w"] + params["head"]["b"]


def greedy_ctc_decode(logits: np.ndarray, length: np.ndarray,
                      blank_id: int = 0) -> list[list[int]]:
    """Argmax → collapse repeats → drop blanks (host-side)."""
    out = []
    N = logits.shape[1]
    for b in range(logits.shape[0]):
        n = int(round(float(length[b]) * N))
        path = logits[b, :n].argmax(-1)
        seq, prev = [], -1
        for t in path:
            if t != prev and t != blank_id:
                seq.append(int(t))
            prev = t
        out.append(seq)
    return out


def run_asr(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from audiocodecs_tpu.downstream.cache import TokenCache
    from audiocodecs_tpu.downstream.config import build_codec, dump_config
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.metrics.external import word_error_rate
    from audiocodecs_tpu.downstream.models.multihead import (
        init_multihead_embedding,
    )
    from audiocodecs_tpu.downstream.models.pooling import init_weighted_pooling
    from audiocodecs_tpu.downstream.recipes.trainer import (
        Trainer,
        trainer_kwargs,
    )
    from audiocodecs_tpu.downstream.text import build_tokenizer
    from audiocodecs_tpu.nn.lstm import init_lstm_params

    sample_rate = int(cfg["sample_rate"])
    out_dir = cfg.get("output_folder", "results/asr")
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, out_dir)

    from audiocodecs_tpu.downstream.recipes.common import (
        loader_kwargs,
        read_split_manifests,
    )

    rows = read_split_manifests(cfg)
    # reference default is a 1000-piece BPE over the train manifest
    # (asr.yaml:54-55,97-103); char stays available as the fallback
    tokenizer = build_tokenizer(
        [r["wrd"] for r in rows["train"]],
        token_type=cfg.get("token_type", "char"),
        num_tokens=int(cfg.get("num_tokens", 1000)),
        character_coverage=float(cfg.get("character_coverage", 1.0)),
    )

    codec = build_codec(cfg, sample_rate, mode="encode")
    from audiocodecs_tpu.downstream.recipes.common import vocab_spec

    K, C = codec.config.num_codebooks, vocab_spec(codec)
    cache = TokenCache(os.path.join(out_dir, "token_cache.npz"))

    emb_dim = int(cfg.get("embedding_dim_probe", 128))
    hidden = int(cfg.get("probe_hidden", 128))
    key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    k1, k2, k3, k4 = jax.random.split(key, 4)
    params = {
        "embedding": init_multihead_embedding(k1, K, C, emb_dim),
        "pool": init_weighted_pooling(k1, K),
        "lstm_fwd": init_lstm_params(k2, 1, emb_dim, hidden),
        "lstm_bwd": init_lstm_params(k3, 1, emb_dim, hidden),
        "head": {
            "w": jax.random.normal(k4, (2 * hidden, tokenizer.vocab_size))
            * hidden**-0.5,
            "b": jnp.zeros((tokenizer.vocab_size,)),
        },
    }
    if cfg.get("pretrain_embeddings", True):
        from audiocodecs_tpu.downstream.models.multihead import (
            fused_table_from_embs,
        )

        params["embedding"] = {"table": jnp.asarray(
            fused_table_from_embs(codec.embs(), C, emb_dim))}

    max_label = int(cfg.get("max_label_len", 64))

    augmenter = None
    if cfg.get("augment", False):
        from audiocodecs_tpu.downstream.augment import build_augmenter

        augmenter = build_augmenter(cfg)
    aug_root = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 17)

    def encode_batch(batch, aug_key=None):
        if aug_key is not None:
            # Augmented waveforms differ every epoch: bypass the token
            # cache entirely, both read and write (the reference caches
            # only when augmentation is off, train_asr.py:49-61).
            sig = jnp.asarray(batch["sig"])
            samples = jnp.round(
                jnp.asarray(batch["length"]) * sig.shape[1])
            toks = np.asarray(codec.sig_to_toks(
                augmenter(sig, aug_key, samples),
                jnp.asarray(batch["length"])))
        else:
            toks = cache.get_batch(batch["ids"])
            if toks is None:
                toks = np.asarray(
                    codec.sig_to_toks(jnp.asarray(batch["sig"]),
                                      jnp.asarray(batch["length"]))
                )
                cache.put_batch(batch["ids"], toks)
        labels = np.zeros((len(batch["ids"]), max_label), np.int32)
        label_pad = np.ones((len(batch["ids"]), max_label), np.float32)
        for i, r in enumerate(batch["rows"]):
            ids = tokenizer.encode(r["wrd"])[:max_label]
            labels[i, : len(ids)] = ids
            label_pad[i, : len(ids)] = 0.0
        return toks, labels, label_pad

    def loss_fn(params, batch, key):
        logits = asr_forward(params, batch["toks"], batch["length"],
                             vocab_size=C)
        N = logits.shape[1]
        frames = jnp.round(batch["length"] * N)
        logit_pad = (jnp.arange(N)[None] >= frames[:, None]).astype(jnp.float32)
        loss = optax.ctc_loss(
            logits, logit_pad, batch["labels"], batch["label_pad"],
            blank_id=tokenizer.blank_id,
        ).mean()
        return loss, {}

    def make_batches(split, shuffle, train: bool = False):
        epoch_counter = itertools.count()

        def gen():
            epoch = next(epoch_counter)  # one gen() call per epoch pass
            loader = BucketedLoader(
                rows[split], sample_rate,
                shuffle=shuffle, seed=int(cfg.get("seed", 0)),
                **loader_kwargs(cfg),
            )
            for bi, batch in enumerate(loader):
                aug_key = (jax.random.fold_in(aug_root,
                                              epoch * 100003 + bi)
                           if (train and augmenter is not None) else None)
                toks, labels, label_pad = encode_batch(batch, aug_key)
                yield {
                    "toks": jnp.asarray(toks),
                    "length": jnp.asarray(batch["length"]),
                    "labels": jnp.asarray(labels),
                    "label_pad": jnp.asarray(label_pad),
                    "rows": batch["rows"],
                }
        return gen

    @jax.jit
    def infer(params, toks, length):
        return asr_forward(params, toks, length, vocab_size=C)

    def wer_of(params, split):
        hyps, refs = [], []
        for batch in make_batches(split, False)():
            logits = np.asarray(infer(params, batch["toks"], batch["length"]))
            for seq, r in zip(
                greedy_ctc_decode(logits, np.asarray(batch["length"]),
                                  tokenizer.blank_id),
                batch["rows"],
            ):
                hyps.append(tokenizer.decode(seq))
                refs.append(r["wrd"])
        wer = word_error_rate(hyps, refs)
        cer = word_error_rate(
            [" ".join(h.replace(" ", "_")) for h in hyps],
            [" ".join(r.replace(" ", "_")) for r in refs],
        )
        return wer, cer

    def batch_no_rows(gen):
        def inner():
            for b in gen():
                yield {k: v for k, v in b.items() if k != "rows"}
        return inner

    trainer = Trainer(loss_fn, params, lr=float(cfg.get("lr", 1e-3)),
                      output_folder=out_dir, **trainer_kwargs(cfg))
    trainer.fit(
        int(cfg.get("epochs", 5)),
        batch_no_rows(make_batches("train", True, train=True)),
        valid_fn=lambda p: wer_of(p, "valid")[0],
    )
    cache.save()
    params = trainer.load_checkpoint("best")
    wer, cer = wer_of(params, "test")
    summary = {"test_WER": wer, "test_CER": cer,
               "vocab_size": tokenizer.vocab_size}

    # Token→char frequency matrix (reference artifact,
    # train_asr.py:115-117,171-198): co-occurrence of codebook-0 codec
    # tokens with the frame-wise argmax character.
    C0 = C[0] if isinstance(C, tuple) else C  # codebook-0 vocab
    freq = np.zeros((C0, tokenizer.vocab_size), np.int64)
    for batch in make_batches("test", False)():
        logits = np.asarray(infer(params, batch["toks"], batch["length"]))
        chars = logits.argmax(-1)  # [B, N]
        toks0 = np.asarray(batch["toks"])[..., 0]  # codebook 0
        N = chars.shape[1]
        valid = (np.arange(N)[None]
                 < np.asarray(batch["length"])[:, None] * N)
        np.add.at(freq, (toks0[valid], chars[valid]), 1)
    np.save(os.path.join(out_dir, "freq_matrix.npy"), freq)
    with open(os.path.join(out_dir, "freq_matrix.txt"), "w") as f:
        used = freq.sum(1) > 0
        f.write(f"# token->char frequency; {int(used.sum())}/{C} tokens seen\n")
        for t in np.nonzero(used)[0][:200]:
            top = freq[t].argmax()
            f.write(f"{t}\t{tokenizer.itos[top]}\t{int(freq[t, top])}\n")
    summary["tokens_seen"] = int(used.sum())
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    with open(os.path.join(out_dir, "wer.txt"), "w") as f:
        f.write(json.dumps(summary) + "\n")
    return summary


def main(argv=None):
    from audiocodecs_tpu.downstream.config import parse_cli
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg, _ = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = prepare_data(cfg)
    print(json.dumps(run_asr(cfg), indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
