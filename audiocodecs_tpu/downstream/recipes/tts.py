"""TTS recipe: char-token prompt → Llama decoder over flattened audio tokens.

Capability parity with the reference's ``train_tts.py`` (char tokens +
speaker embedding as prompt prefix → LlamaDecoder CE over K-interleaved audio
tokens; test-time generation + vocode — reference ``train_tts.py:82-153``).
The speaker-embedding prefix uses the first-party WavLM x-vector encoder
(``downstream/models/speaker_encoder.py``): set ``speaker_encoder_checkpoint``
to a converted ``wavlm_xvector`` .npz (see ``tools/convert_checkpoints.py``)
and the per-utterance embedding is cached (reference caches the same way,
``train_tts.py:63-73``), projected to the model width, and prepended to the
prompt. Without a checkpoint the prompt is text-only.

Run:
    python -m audiocodecs_tpu.downstream.recipes.tts \
        hparams/tasks/tts.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def run_tts(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from audiocodecs_tpu.downstream.cache import TokenCache
    from audiocodecs_tpu.downstream.config import build_codec, dump_config
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_forward,
        llama_generate,
    )
    from audiocodecs_tpu.downstream.recipes.slm import flatten_with_specials
    from audiocodecs_tpu.downstream.recipes.trainer import (
        Trainer,
        trainer_kwargs,
    )
    from audiocodecs_tpu.utils.audio import write_wav

    sample_rate = int(cfg["sample_rate"])
    out_dir = cfg.get("output_folder", "results/tts")
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, out_dir)

    from audiocodecs_tpu.downstream.recipes.common import (
        loader_kwargs,
        read_split_manifests,
    )

    rows = read_split_manifests(cfg)
    from audiocodecs_tpu.downstream.text import build_tokenizer

    tokenizer = build_tokenizer(
        [r["wrd"] for r in rows["train"]],
        token_type=cfg.get("token_type", "char"),
        num_tokens=int(cfg.get("num_tokens", 1000)),
        character_coverage=float(cfg.get("character_coverage", 1.0)),
    )
    codec = build_codec(cfg, sample_rate)
    K, C = codec.config.num_codebooks, codec.config.vocab_size
    cache = TokenCache(os.path.join(out_dir, "token_cache.npz"))

    # Text tokens live in an extra vocabulary band appended after the audio
    # content rows and specials: flat id = K·C + num_special + char_id.
    lcfg = LlamaConfig(
        vocab_size=C,
        num_codebooks=K,
        hidden_size=int(cfg.get("d_model", 256)),
        num_layers=int(cfg.get("num_layers", 4)),
        num_heads=int(cfg.get("num_heads", 4)),
        num_kv_heads=int(cfg.get("num_kv_heads", 2)),
        intermediate_size=int(cfg.get("ffn_dim", 688)),
        num_special=3 + tokenizer.vocab_size,
        remat=bool(cfg.get("remat", False)),
    )
    params = init_llama_params(jax.random.PRNGKey(int(cfg.get("seed", 0))), lcfg)
    if cfg.get("pretrain_embeddings", True):
        # audio-content rows seeded from codec.embs() (reference
        # train_tts.py:448-450); text/special rows stay random
        ce = np.asarray(codec.embs()).reshape(K * C, -1)
        table = np.array(params["embedding"]["table"])
        dim = min(ce.shape[-1], table.shape[-1])
        table[: K * C, :dim] = ce[:, :dim]
        params["embedding"]["table"] = jnp.asarray(table)
    text_base = K * C + 3

    # Optional speaker-embedding prompt prefix (reference train_tts.py:96-101)
    spk_fn = None
    spk_cache: dict = {}
    if cfg.get("speaker_encoder_checkpoint"):
        from audiocodecs_tpu.downstream.models.speaker_encoder import (
            load_xvector,
        )

        _, xv_cfg, xv_embed = load_xvector(
            cfg["speaker_encoder_checkpoint"],
            cfg.get("speaker_encoder_config"),
        )
        spk_dim = xv_cfg.xvector_dim
        key_spk = jax.random.PRNGKey(int(cfg.get("seed", 0)) + 7)
        params["spk_proj"] = {
            "w": jax.random.normal(key_spk, (spk_dim, lcfg.hidden_size))
            * spk_dim**-0.5,
            "b": jnp.zeros((lcfg.hidden_size,)),
        }

        def spk_fn(batch):
            embs = []
            for i, r in enumerate(batch["rows"]):
                if r["ID"] not in spk_cache:
                    spk_cache[r["ID"]] = np.asarray(
                        xv_embed(jnp.asarray(batch["sig"][i:i + 1]))
                    )[0]
                embs.append(spk_cache[r["ID"]])
            return jnp.asarray(np.stack(embs))  # [B, spk_dim]

    max_text = int(cfg.get("max_text_len", 48))
    max_flat = int(cfg.get("max_flat_len", 384))

    def build_sequences(batch):
        """[text prompt | BOS | audio tokens | EOS | pad] per utterance.

        The text prompt is padded to a multiple of K so audio content starts
        on codebook 0 (reference pads the prompt likewise,
        ``train_tts.py:82-88``).
        """
        toks = cache.get_batch(batch["ids"])
        if toks is None:
            toks = np.asarray(
                codec.sig_to_toks(jnp.asarray(batch["sig"]),
                                  jnp.asarray(batch["length"]))
            )
            cache.put_batch(batch["ids"], toks)
        B, N, _ = toks.shape
        prompt_len = ((max_text + 1) // K + 1) * K
        audio_flat, audio_mask = flatten_with_specials(
            toks, batch["length"], lcfg.bos_token, lcfg.eos_token,
            lcfg.pad_token, max_flat - prompt_len,
        )
        flat = np.full((B, max_flat), lcfg.pad_token, np.int32)
        mask = np.zeros((B, max_flat), np.float32)
        for i, r in enumerate(batch["rows"]):
            text = tokenizer.encode(r["wrd"])[:max_text]
            flat[i, : len(text)] = text_base + np.asarray(text, np.int32)
            flat[i, prompt_len:] = audio_flat[i]
            mask[i, prompt_len:] = audio_mask[i]
        return flat, mask

    def nll(params, flat, mask, spk_emb=None):
        from audiocodecs_tpu.downstream.models.llama import llama_embed

        embs = llama_embed(params, flat, lcfg)
        if spk_emb is not None:
            # speaker conditioning added to the text-prompt positions
            cond = jnp.einsum("bd,dh->bh", spk_emb, params["spk_proj"]["w"]) \
                + params["spk_proj"]["b"]
            embs = embs.at[:, 0].add(cond)
        logits = llama_forward(params, embs, lcfg)
        L = flat.shape[1]
        cb = (jnp.arange(L - 1) % K).astype(jnp.int32)
        lg = jnp.take_along_axis(
            logits[:, :-1], cb[None, :, None, None], axis=2
        )[:, :, 0]
        tgt = flat[:, 1:]
        # specials map into the extra head logits (EOS trainable); text
        # tokens are never loss targets (mask excludes the prompt region).
        head_tgt = jnp.where(tgt >= K * C, C + jnp.minimum(tgt - K * C, 2),
                             tgt)
        ce = optax.softmax_cross_entropy_with_integer_labels(lg, head_tgt)
        m = mask[:, 1:]
        return (ce * m).sum() / jnp.maximum(m.sum(), 1.0)

    def loss_fn(params, batch, key):
        return nll(params, batch["flat"], batch["mask"],
                   batch.get("spk_emb")), {}

    def make_batches(split, shuffle):
        def gen():
            loader = BucketedLoader(
                rows[split], sample_rate,
                shuffle=shuffle, seed=int(cfg.get("seed", 0)),
                **loader_kwargs(cfg),
            )
            for batch in loader:
                flat, mask = build_sequences(batch)
                out = {"flat": jnp.asarray(flat), "mask": jnp.asarray(mask),
                       "rows": batch["rows"], "ids": batch["ids"],
                       "sig": batch["sig"], "length": batch["length"]}
                if spk_fn is not None:
                    out["spk_emb"] = spk_fn(batch)
                yield out
        return gen

    def strip_rows(gen):
        """Keep only the jittable training inputs."""
        def inner():
            for b in gen():
                yield {k: v for k, v in b.items()
                       if k in ("flat", "mask", "spk_emb")}
        return inner

    eval_nll = jax.jit(nll)

    def valid_loss(params, split):
        tot, n = 0.0, 0
        for b in strip_rows(make_batches(split, False))():
            tot += float(eval_nll(params, b["flat"], b["mask"],
                                  b.get("spk_emb")))
            n += 1
        return tot / max(n, 1)

    trainer = Trainer(loss_fn, params, lr=float(cfg.get("lr", 1e-3)),
                      output_folder=out_dir, **trainer_kwargs(cfg))
    trainer.fit(
        int(cfg.get("epochs", 5)),
        strip_rows(make_batches("train", True)),
        valid_fn=lambda p: valid_loss(p, "valid"),
    )
    cache.save()
    params = trainer.load_checkpoint("best")
    summary = {"test_loss": valid_loss(params, "test")}

    # Generate speech for test transcripts, vocode, and score with the
    # generation battery UTMOS/DNSMOS(hyp), dWER(hyp vs reference speech),
    # SpkSim(hyp vs reference speech) — reference train_tts.py:205-211;
    # Rec/Ref control rows under compute_ref_metrics (:216-230). Metrics
    # are config-gated — absent weights just skip that row.
    if cfg.get("generate", True):
        from audiocodecs_tpu.downstream.recipes.quality import (
            PairBattery,
            reconcile_length,
            trim_row,
        )

        # dsp=False: generated speech is not time-aligned with the
        # reference utterance, so intrusive DSP metrics are skipped — the
        # reference TTS battery is UTMOS/DNSMOS/dWER/SpkSim only
        battery = PairBattery(cfg, sample_rate, dsp=False)
        compute_ref = bool(cfg.get("compute_ref_metrics", False))
        prompt_len = ((max_text + 1) // K + 1) * K + 1  # text + BOS
        gen_frames = int(cfg.get("gen_frames", 12))
        gen_fn = jax.jit(
            lambda p, pr, k, e: llama_generate(
                p, lcfg, pr, gen_frames * K, k,
                top_p=float(cfg.get("top_p", 0.9)),
                temperature=float(cfg.get("temperature", 1.0)),
                prompt_emb_add=e,
            )
        )
        gen_dir = os.path.join(out_dir, "generated")
        os.makedirs(gen_dir, exist_ok=True)
        max_batches = int(cfg.get("gen_batches", 0)) or (1 << 30)
        n_dump = total_gen = 0
        for bi, batch in enumerate(make_batches("test", False)()):
            if bi >= max_batches:
                break
            prompt = batch["flat"][:, :prompt_len]
            emb_add = None
            if "spk_emb" in batch:
                # condition position 0 exactly as in training
                cond = (batch["spk_emb"] @ params["spk_proj"]["w"]
                        + params["spk_proj"]["b"])
                emb_add = jnp.zeros(
                    (prompt.shape[0], prompt_len, lcfg.hidden_size)
                ).at[:, 0].add(cond)
            toks, _ = gen_fn(params, prompt, jax.random.PRNGKey(2 + bi),
                             emb_add)
            grid = np.clip(np.asarray(toks), 0, C - 1).reshape(
                toks.shape[0], -1, K
            )
            sig = np.asarray(codec.toks_to_sig(jnp.asarray(grid)))
            ref_np = np.asarray(batch["sig"])
            lens = np.asarray(batch["length"])
            rec_np = None
            if compute_ref:
                ref_toks = cache.get_batch(batch["ids"])
                rec = np.asarray(codec.toks_to_sig(
                    jnp.asarray(ref_toks), jnp.asarray(lens)))
                rec_np = reconcile_length(rec, ref_np.shape[1])
            for i, r in enumerate(batch["rows"]):
                total_gen += 1
                uid = r["ID"]
                h = sig[i]
                s = trim_row(ref_np[i], lens[i])
                # generated-vs-reference rows: UTMOS/DNSMOS on h alone,
                # dWER/SpkSim vs the reference speech — length-asymmetric,
                # so score singles + pair metrics without truncation
                battery.score_single(h, uid=uid)
                if battery.quality["dwer"] is not None:
                    battery.add("dWER", battery.quality["dwer"].metric(
                        [h], [s], sample_rate)[0])
                if battery.quality["spk"] is not None:
                    battery.add("SpkSim", battery.quality["spk"].metric(
                        h[None], s[None], sample_rate)[0])
                if n_dump < int(cfg.get("save_gen_audios", 4)):
                    write_wav(os.path.join(gen_dir, f"{r['ID']}_tts.wav"),
                              h, sample_rate)
                    n_dump += 1
                if compute_ref:
                    rc = trim_row(rec_np[i], lens[i])
                    battery.score_pair(rc, s, prefix="Rec", uid=uid)
                    battery.score_single(s, prefix="Ref", uid=uid)
        summary["generated"] = total_gen
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
    print(json.dumps(run_tts(cfg), indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
