"""Utterance-classification recipes: IC / KS / SER / SI.

One skeleton serves the reference's classification quartet (reference
``train_ic.py`` / ``train_ks.py`` / ``train_ser.py`` / ``train_si.py`` share
the same structure: frozen codec tokens → embedding → LSTM →
StatisticsPooling → linear head → CE, metric = error rate). The task axis
only changes the label field and dataset.

TPU design: the probe is a pure function over a params pytree; tokens come
from the frozen codec under ``stop_gradient`` with a host-side token cache;
one jitted step per length bucket.

Run:
    python -m audiocodecs_tpu.downstream.recipes.classification \
        hparams/tasks/ic.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def build_probe_params(key, num_codebooks, vocab_size, emb_dim, hidden,
                       num_classes, codec_embs=None):
    import jax
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.models.multihead import (
        init_multihead_embedding,
    )
    from audiocodecs_tpu.downstream.models.pooling import init_weighted_pooling
    from audiocodecs_tpu.nn.lstm import init_lstm_params

    k1, k2, k3 = jax.random.split(key, 3)
    emb = init_multihead_embedding(k1, num_codebooks, vocab_size, emb_dim)
    if codec_embs is not None:
        # Pretrain the probe embedding from the codec's codebook vectors
        # (reference ``train_asr.py:235-238``), projected/truncated to emb_dim.
        from audiocodecs_tpu.downstream.models.multihead import (
            fused_table_from_embs,
        )

        emb = {"table": jnp.asarray(
            fused_table_from_embs(codec_embs, vocab_size, emb_dim))}
    return {
        "embedding": emb,
        "pool": init_weighted_pooling(k2, num_codebooks),
        "lstm": init_lstm_params(k2, 1, emb_dim, hidden),
        "head": {
            "w": jax.random.normal(k3, (2 * hidden, num_classes)) * hidden**-0.5,
            "b": jnp.zeros((num_classes,)),
        },
    }


def probe_forward(params, toks, length, *, vocab_size):
    """``toks`` [B, N, K] → class logits [B, num_classes]."""
    import jax.numpy as jnp

    from audiocodecs_tpu.downstream.models.multihead import multihead_embed
    from audiocodecs_tpu.downstream.models.pooling import weighted_pooling
    from audiocodecs_tpu.nn.lstm import lstm
    from audiocodecs_tpu.utils.masking import length_mask

    x = multihead_embed(params["embedding"], toks, vocab_size=vocab_size)
    x = weighted_pooling(params["pool"], x)  # [B, N, H]
    y, _ = lstm(x, params["lstm"])  # [B, N, H]
    mask = length_mask(length, y.shape[1], dtype=y.dtype)[..., None]
    denom = jnp.maximum(mask.sum(axis=1), 1.0)
    mean = (y * mask).sum(axis=1) / denom
    var = ((y - mean[:, None]) ** 2 * mask).sum(axis=1) / denom
    stats = jnp.concatenate([mean, jnp.sqrt(var + 1e-8)], axis=-1)
    return stats @ params["head"]["w"] + params["head"]["b"]


def run_classification(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from audiocodecs_tpu.downstream.cache import TokenCache
    from audiocodecs_tpu.downstream.config import build_codec, dump_config
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.recipes.common import encode_labels
    from audiocodecs_tpu.downstream.recipes.trainer import (
        Trainer,
        trainer_kwargs,
    )

    sample_rate = int(cfg["sample_rate"])
    label_field = cfg.get("label_field", "utt_label")
    out_dir = cfg.get("output_folder", f"results/{cfg.get('task', 'cls')}")
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, out_dir)

    from audiocodecs_tpu.downstream.recipes.common import (
        loader_kwargs,
        read_split_manifests,
    )

    rows = read_split_manifests(cfg)
    label_map, labels = encode_labels(
        rows["train"] + rows["valid"] + rows["test"], label_field
    )

    codec = build_codec(cfg, sample_rate, mode="encode")
    K = codec.config.num_codebooks
    from audiocodecs_tpu.downstream.recipes.common import vocab_spec

    C = vocab_spec(codec)  # int, or K-tuple for heterogeneous codebooks
    cache = TokenCache(os.path.join(out_dir, "token_cache.npz"))

    augmenter = None
    if cfg.get("augment", False):
        from audiocodecs_tpu.downstream.augment import build_augmenter

        augmenter = build_augmenter(cfg)
    aug_root = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 17)

    def encode_batch(batch, aug_key=None):
        if aug_key is not None:
            # waveform augmentation (reference train_ic.py:47-48) changes
            # per epoch → never touch the token cache (train_ic.py:50-63)
            sig = jnp.asarray(batch["sig"])
            samples = jnp.round(
                jnp.asarray(batch["length"]) * sig.shape[1])
            return np.asarray(codec.sig_to_toks(
                augmenter(sig, aug_key, samples),
                jnp.asarray(batch["length"])))
        toks = cache.get_batch(batch["ids"])
        if toks is None:
            toks = np.asarray(
                codec.sig_to_toks(jnp.asarray(batch["sig"]),
                                  jnp.asarray(batch["length"]))
            )
            cache.put_batch(batch["ids"], toks)
        return toks

    emb_dim = int(cfg.get("embedding_dim_probe", 128))
    hidden = int(cfg.get("probe_hidden", 128))
    params = build_probe_params(
        jax.random.PRNGKey(int(cfg.get("seed", 0))), K, C, emb_dim, hidden,
        len(labels),
        codec_embs=codec.embs() if cfg.get("pretrain_embeddings", True) else None,
    )

    def loss_fn(params, batch, key):
        logits = probe_forward(params, batch["toks"], batch["length"],
                               vocab_size=C)
        oh = jax.nn.one_hot(batch["label"], len(labels))
        loss = optax.softmax_cross_entropy(logits, oh).mean()
        acc = jnp.mean(
            (jnp.argmax(logits, -1) == batch["label"]).astype(jnp.float32)
        )
        return loss, {"acc": acc}

    # Token-corruption augmentation (the Codec.resample tool, reference
    # codec.py:121-148) — applied after the cache so cached clean tokens
    # stay reusable.
    corrupt_p = float(cfg.get("token_corrupt_p", 0.0))
    corrupt_key = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 1)

    def make_batches(split, shuffle, augment=False):
        import itertools

        epoch_counter = itertools.count()

        def gen():
            nonlocal corrupt_key
            epoch = next(epoch_counter)
            loader = BucketedLoader(
                rows[split], sample_rate,
                shuffle=shuffle, seed=int(cfg.get("seed", 0)),
                **loader_kwargs(cfg),
            )
            for bi, batch in enumerate(loader):
                aug_key = (jax.random.fold_in(aug_root,
                                              epoch * 100003 + bi)
                           if (augment and augmenter is not None) else None)
                toks = jnp.asarray(encode_batch(batch, aug_key))
                if augment and corrupt_p > 0.0:
                    corrupt_key, sub = jax.random.split(corrupt_key)
                    toks = codec.resample(toks, sub, p=corrupt_p)
                yield {
                    "toks": toks,
                    "length": jnp.asarray(batch["length"]),
                    "label": jnp.asarray(
                        [label_map[r[label_field]] for r in batch["rows"]]
                    ),
                }
        return gen

    @jax.jit
    def predict(params, toks, length):
        return jnp.argmax(probe_forward(params, toks, length, vocab_size=C), -1)

    def error_rate(params, split):
        errs = tot = 0
        for batch in make_batches(split, False)():
            pred = np.asarray(predict(params, batch["toks"], batch["length"]))
            want = np.asarray(batch["label"])
            errs += int((pred != want).sum())
            tot += len(want)
        return errs / max(tot, 1)

    trainer = Trainer(
        loss_fn, params, lr=float(cfg.get("lr", 1e-3)),
        output_folder=out_dir, **trainer_kwargs(cfg)
    )
    trainer.fit(
        int(cfg.get("epochs", 5)),
        make_batches("train", True, augment=True),
        valid_fn=lambda p: error_rate(p, "valid"),
    )
    cache.save()
    params = trainer.load_checkpoint("best")
    test_er = error_rate(params, "test")
    summary = {"test_ER": test_er, "best_valid_ER": trainer.best_metric,
               "num_classes": len(labels)}
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    from audiocodecs_tpu.downstream.config import parse_cli
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg, _ = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = prepare_data(cfg)
    print(json.dumps(run_classification(cfg), indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
