"""Speech enhancement (SE): token-to-token denoising.

Capability parity with the reference's ``train_se.py`` (noisy tokens →
encoder → ``MultiHeadLinear`` → CE against clean tokens; argmax-vocode +
signal metrics at test — reference ``train_se.py:58-129``). The reference
uses a SpeechBrain Conformer; select it with ``encoder_type: conformer``
(first-party conv-augmented blocks, ``nn/conformer.py``) or keep the default
transformer stack.

Run:
    python -m audiocodecs_tpu.downstream.recipes.se \
        hparams/tasks/se.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def se_forward(params, toks, cfg_t, *, vocab_size, num_codebooks):
    from audiocodecs_tpu.downstream.models.multihead import (
        multihead_embed,
        multihead_logits,
    )
    from audiocodecs_tpu.downstream.models.pooling import weighted_pooling

    x = multihead_embed(params["embedding"], toks, vocab_size=vocab_size)
    x = weighted_pooling(params["pool"], x)  # [B, N, H]
    if "conformer" in params:
        from audiocodecs_tpu.nn.conformer import apply_conformer

        x = apply_conformer(params["conformer"], x, cfg_t)
    else:
        from audiocodecs_tpu.nn.transformer import apply_transformer

        x = apply_transformer(params["encoder"], x, cfg_t)
    return multihead_logits(params["head"], x, num_heads=num_codebooks,
                            vocab_size=vocab_size)


def run_se(cfg: dict) -> dict:
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
    out_dir = cfg.get("output_folder", "results/se")
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
    encoder_type = cfg.get("encoder_type", "transformer")
    key = jax.random.PRNGKey(int(cfg.get("seed", 0)))
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "embedding": init_multihead_embedding(k1, K, C, d_model),
        "pool": init_weighted_pooling(k1, K),
        "head": init_multihead_linear(k3, d_model, K, C),
    }
    if encoder_type == "conformer":
        # Conv-augmented encoder (the reference's SE model choice)
        from audiocodecs_tpu.nn.conformer import (
            ConformerConfig,
            init_conformer_params,
        )

        cfg_t = ConformerConfig(
            hidden_size=d_model,
            num_layers=int(cfg.get("num_layers", 4)),
            num_heads=int(cfg.get("num_heads", 4)),
            conv_kernel=int(cfg.get("conv_kernel", 31)),
        )
        params["conformer"] = init_conformer_params(k2, cfg_t)
    else:
        cfg_t = TransformerConfig(
            hidden_size=d_model,
            num_layers=int(cfg.get("num_layers", 4)),
            num_heads=int(cfg.get("num_heads", 4)),
            num_kv_heads=int(cfg.get("num_heads", 4)),
            head_dim=d_model // int(cfg.get("num_heads", 4)),
            intermediate_size=int(cfg.get("ffn_dim", 1024)),
            act="gelu", norm="layernorm", causal=False,
        )
        params["encoder"] = init_transformer_params(k2, cfg_t)

    def read_pair(row):
        noisy, _ = read_wav(row["noisy_wav"])
        clean, _ = read_wav(row["wav"])
        return noisy[0], clean[0]

    def encode_pair_batch(batch):
        """Joint encode of noisy+clean in ONE codec call (reference encodes
        input and output signals together, ``train_se.py:58-66``)."""
        noisy = batch["sig"]
        clean = np.zeros_like(noisy)
        for i, r in enumerate(batch["rows"]):
            c, _ = read_wav(r["wav"])
            n = min(len(c[0]), clean.shape[1])
            clean[i, :n] = c[0][:n]
        both = np.concatenate([noisy, clean], axis=0)
        lens = np.concatenate([batch["length"], batch["length"]])
        toks = np.asarray(
            codec.sig_to_toks(jnp.asarray(both), jnp.asarray(lens))
        )
        B = noisy.shape[0]
        return toks[:B], toks[B:], clean

    def loss_fn(params, batch, key):
        logits = se_forward(params, batch["in_toks"], cfg_t,
                            vocab_size=C, num_codebooks=K)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, batch["out_toks"]
        )  # [B, N, K]
        mask = length_mask(batch["length"], ce.shape[1], dtype=ce.dtype)[..., None]
        loss = (ce * mask).sum() / jnp.maximum(mask.sum() * K, 1.0)
        return loss, {}

    def make_batches(split, shuffle, with_audio=False):
        def gen():
            loader = BucketedLoader(
                rows[split], sample_rate,
                shuffle=shuffle, seed=int(cfg.get("seed", 0)),
                read_fn=lambda r: read_wav(r["noisy_wav"])[0][0],
                **loader_kwargs(cfg),
            )
            for batch in loader:
                in_toks, out_toks, clean = encode_pair_batch(batch)
                out = {
                    "in_toks": jnp.asarray(in_toks),
                    "out_toks": jnp.asarray(out_toks),
                    "length": jnp.asarray(batch["length"]),
                }
                if with_audio:
                    out["clean"] = clean
                    out["ids"] = batch["ids"]
                yield out
        return gen

    @jax.jit
    def enhance(params, toks):
        logits = se_forward(params, toks, cfg_t, vocab_size=C,
                            num_codebooks=K)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def token_accuracy(params, split):
        correct = total = 0
        for batch in make_batches(split, False)():
            pred = np.asarray(enhance(params, batch["in_toks"]))
            want = np.asarray(batch["out_toks"])
            N = want.shape[1]
            m = (np.arange(N)[None, :, None]
                 < np.asarray(batch["length"])[:, None, None] * N)
            correct += int((pred == want)[np.broadcast_to(m, pred.shape)].sum())
            total += int(m.sum() * K)
        return 1.0 - correct / max(total, 1)  # token error rate

    trainer = Trainer(loss_fn, params, lr=float(cfg.get("lr", 1e-3)),
                      output_folder=out_dir, **trainer_kwargs(cfg))
    trainer.fit(
        int(cfg.get("epochs", 5)),
        make_batches("train", True),
        valid_fn=lambda p: token_accuracy(p, "valid"),
    )
    params = trainer.load_checkpoint("best")

    # Test: vocode enhanced tokens, score the full battery vs clean
    # (reference train_se.py:153-161: UTMOS/DNSMOS/STOI/PESQ/MelD/STFTD/
    # dWER/SpkSim; Rec control rows on the clean roundtrip and Ref rows on
    # the clean signal under compute_ref_metrics, :164-182)
    from audiocodecs_tpu.downstream.recipes.quality import (
        PairBattery,
        trim_row,
    )

    battery = PairBattery(cfg, sample_rate)
    compute_ref = bool(cfg.get("compute_ref_metrics", False))
    sisnrs = []
    for batch in make_batches("test", False, with_audio=True)():
        pred = enhance(params, batch["in_toks"])
        sig = np.asarray(codec.toks_to_sig(pred))
        T = min(sig.shape[1], batch["clean"].shape[1])
        sisnrs.extend(
            np.asarray(
                si_snr(jnp.asarray(sig[:, :T]),
                       jnp.asarray(batch["clean"][:, :T]))
            ).tolist()
        )
        rec = (np.asarray(codec.toks_to_sig(batch["out_toks"]))
               if compute_ref else None)
        lens = np.asarray(batch["length"])
        for i in range(sig.shape[0]):
            uid = batch["ids"][i]
            h = trim_row(sig[i], lens[i])
            c = trim_row(batch["clean"][i], lens[i])
            battery.score_pair(h, c, uid=uid)
            if compute_ref:
                battery.score_pair(trim_row(rec[i], lens[i]), c,
                                   prefix="Rec", uid=uid)
                battery.score_single(c, prefix="Ref", uid=uid)
    summary = {
        "test_TER": token_accuracy(params, "test"),
        "test_SISNR": float(np.mean(sisnrs)) if sisnrs else float("nan"),
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
    print(json.dumps(run_se(cfg), indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
