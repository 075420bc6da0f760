"""Speech language modeling (SLM) recipe.

Capability parity with the reference's ``train_slm.py``: flatten the
``[B, N, K]`` token grid K-interleaved to ``[B, N·K]``, wrap with BOS/EOS,
train the Llama-style decoder with CE; at test time report token perplexity
and generate continuations from the first half of each utterance, vocoding
them through the codec (reference ``train_slm.py:59-123``; embedding
pretraining from codec ``embs()`` at ``:424-427``).

Run:
    python -m audiocodecs_tpu.downstream.recipes.slm \
        hparams/tasks/slm.yaml hparams/codecs/encodec.yaml \
        hparams/datasets/synthetic.yaml
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np


def flatten_with_specials(toks: np.ndarray, tok_lengths: np.ndarray,
                          bos: int, eos: int, pad: int, max_flat: int):
    """[B, N, K] + valid frame counts → flat [B, max_flat] with BOS/EOS/pad
    and a loss mask (mask covers content + EOS, not BOS/pad)."""
    B, N, K = toks.shape
    flat = np.full((B, max_flat), pad, np.int32)
    mask = np.zeros((B, max_flat), np.float32)
    for b in range(B):
        n = int(round(float(tok_lengths[b]) * N))
        seq = toks[b, :n].reshape(-1)[: max_flat - 2]
        flat[b, 0] = bos
        flat[b, 1 : 1 + len(seq)] = seq
        flat[b, 1 + len(seq)] = eos
        mask[b, 1 : 2 + len(seq)] = 1.0
    return flat, mask


def run_slm(cfg: dict) -> dict:
    import jax
    import jax.numpy as jnp
    import optax

    from audiocodecs_tpu.downstream.cache import TokenCache
    from audiocodecs_tpu.downstream.config import build_codec, dump_config
    from audiocodecs_tpu.downstream.datasets.loader import BucketedLoader
    from audiocodecs_tpu.downstream.models.llama import (
        LlamaConfig,
        init_llama_params,
        llama_embed,
        llama_forward,
        llama_generate,
    )
    from audiocodecs_tpu.downstream.recipes.trainer import (
        Trainer,
        trainer_kwargs,
    )
    from audiocodecs_tpu.utils.audio import write_wav

    sample_rate = int(cfg["sample_rate"])
    out_dir = cfg.get("output_folder", "results/slm")
    os.makedirs(out_dir, exist_ok=True)
    dump_config(cfg, out_dir)

    from audiocodecs_tpu.downstream.recipes.common import (
        loader_kwargs,
        read_split_manifests,
    )

    rows = read_split_manifests(cfg)
    codec = build_codec(cfg, sample_rate)
    K, C = codec.config.num_codebooks, codec.config.vocab_size
    cache = TokenCache(os.path.join(out_dir, "token_cache.npz"))

    lcfg = LlamaConfig(
        vocab_size=C,
        num_codebooks=K,
        hidden_size=int(cfg.get("d_model", 256)),
        num_layers=int(cfg.get("num_layers", 4)),
        num_heads=int(cfg.get("num_heads", 4)),
        num_kv_heads=int(cfg.get("num_kv_heads", 2)),
        intermediate_size=int(cfg.get("ffn_dim", 688)),
        max_seq_len=int(cfg.get("max_seq_len", 2048)),
        remat=bool(cfg.get("remat", False)),  # per-layer activation remat
        # moe_experts > 0: switch-MoE FFN decoder (expert_parallel: S
        # shards the stacked experts over the model mesh axis)
        moe_experts=int(cfg.get("moe_experts", 0)),
        moe_ffn_size=int(cfg.get("moe_ffn_size", 0)),
        moe_capacity_factor=float(cfg.get("moe_capacity_factor", 2.0)),
        moe_top_k=int(cfg.get("moe_top_k", 1)),
        moe_aux_weight=float(cfg.get("moe_aux_weight", 0.0)),
    )
    params = init_llama_params(jax.random.PRNGKey(int(cfg.get("seed", 0))), lcfg)
    if cfg.get("pretrain_embeddings", True):
        ce = np.asarray(codec.embs()).reshape(K * C, -1)
        table = np.array(params["embedding"]["table"])
        dim = min(ce.shape[-1], table.shape[-1])
        table[: K * C, :dim] = ce[:, :dim]
        params["embedding"]["table"] = jnp.asarray(table)

    max_flat = int(cfg.get("max_flat_len", 512))

    def encode_batch(batch):
        toks = cache.get_batch(batch["ids"])
        if toks is None:
            toks = np.asarray(
                codec.sig_to_toks(jnp.asarray(batch["sig"]),
                                  jnp.asarray(batch["length"]))
            )
            cache.put_batch(batch["ids"], toks)
        return flatten_with_specials(
            toks, batch["length"], lcfg.bos_token, lcfg.eos_token,
            lcfg.pad_token, max_flat,
        )

    def nll(params, flat, mask, with_aux: bool = False):
        """Per-token CE of next-token prediction, masked. ``with_aux``
        adds the weighted MoE load-balancing loss (training only — eval
        PPL stays pure CE so MoE and dense runs are comparable)."""
        embs = llama_embed(params, flat, lcfg)
        aux = 0.0
        if with_aux and lcfg.moe_experts > 0 and lcfg.moe_aux_weight > 0:
            logits, aux = llama_forward(params, embs, lcfg, return_aux=True)
            aux = lcfg.moe_aux_weight * aux
        else:
            logits = llama_forward(params, embs, lcfg)  # [B, L, K, C]
        L = flat.shape[1]
        # position i predicts position i+1, whose codebook is (i+1)%K
        # (position 0 is BOS; content starts at 1 with codebook 0)
        cb = ((jnp.arange(L - 1)) % K).astype(jnp.int32)
        lg = jnp.take_along_axis(
            logits[:, :-1], cb[None, :, None, None], axis=2
        )[:, :, 0]  # [B, L-1, head_vocab]
        tgt = flat[:, 1:]
        # specials (EOS/pad) map to the extra head logits after the C
        # content entries, so EOS is trained and generatable.
        head_tgt = jnp.where(tgt >= K * C, C + (tgt - K * C), tgt)
        ce = optax.softmax_cross_entropy_with_integer_labels(lg, head_tgt)
        m = mask[:, 1:]
        return (ce * m).sum() / jnp.maximum(m.sum(), 1.0) + aux

    def loss_fn(params, batch, key):
        loss = nll(params, batch["flat"], batch["mask"], with_aux=True)
        return loss, {}

    mp = int(cfg.get("model_parallel", 1))
    pp = int(cfg.get("pipeline_parallel", 1))
    ep = int(cfg.get("expert_parallel", 1))

    def make_batches(split, shuffle):
        # the GPipe schedule reshapes the batch into microbatches inside a
        # shard_map, so ragged tail batches are padded back to batch_size
        # with all-pad zero-mask rows (zero loss contribution)
        pad_to = int(cfg.get("batch_size", 4)) if pp > 1 else 0

        def gen():
            loader = BucketedLoader(
                rows[split], sample_rate,
                shuffle=shuffle, seed=int(cfg.get("seed", 0)),
                **loader_kwargs(cfg),
            )
            for batch in loader:
                flat, mask = encode_batch(batch)
                if pad_to and flat.shape[0] < pad_to:
                    extra = pad_to - flat.shape[0]
                    flat = np.concatenate(
                        [flat, np.full((extra, flat.shape[1]),
                                       lcfg.pad_token, np.int32)])
                    mask = np.concatenate(
                        [mask, np.zeros((extra, mask.shape[1]), np.float32)])
                yield {"flat": jnp.asarray(flat), "mask": jnp.asarray(mask)}
        return gen

    eval_nll = jax.jit(nll)

    def valid_ppl(params, split):
        tot, n = 0.0, 0
        for batch in make_batches(split, False)():
            tot += float(eval_nll(params, batch["flat"], batch["mask"]))
            n += 1
        return float(np.exp(tot / max(n, 1)))

    # model_parallel: N > 1 shards the decoder Megatron-style over a
    # (data, model) mesh (q/k/v + MLP-up on the head/FFN axis, o + down on
    # the input axis, vocab-parallel embedding/head). pipeline_parallel:
    # S > 1 instead splits the decoder depth into S GPipe stages on the
    # model axis (num_microbatches deep, activations over lax.ppermute) —
    # both are the SAME train steps the multichip dryrun validates, now
    # reachable from the recipe.
    sharder, mesh, train_loss = None, None, loss_fn
    if sum(x > 1 for x in (mp, pp, ep)) > 1:
        raise ValueError(
            "set ONE of model_parallel / pipeline_parallel / "
            "expert_parallel > 1 (they all occupy the model mesh axis)")
    if ep > 1:
        if lcfg.moe_experts <= 0:
            raise ValueError("expert_parallel needs moe_experts > 0")
        from audiocodecs_tpu.parallel.moe import shard_moe_llama_params

        mp = ep  # experts live on the model mesh axis
        sharder = shard_moe_llama_params
    if pp > 1:
        from audiocodecs_tpu.parallel.mesh import make_mesh
        from audiocodecs_tpu.parallel.pipeline import (
            make_pp_slm_loss,
            shard_pp_llama_params,
            stack_pipeline_stages,
            unstack_pipeline_stages,
        )

        mesh = make_mesh(model_parallel=pp)
        pp_loss = make_pp_slm_loss(
            lcfg, mesh, int(cfg.get("num_microbatches", 2)))

        def train_loss(params, batch, key):
            return pp_loss(params, batch["flat"], batch["mask"]), {}

        def sharder(p, mesh_):
            return shard_pp_llama_params(stack_pipeline_stages(p, pp), mesh_)
    elif mp > 1 and ep == 1:
        from audiocodecs_tpu.parallel.train import shard_llama_params

        sharder = shard_llama_params
    trainer = Trainer(train_loss, params, lr=float(cfg.get("lr", 1e-3)),
                      output_folder=out_dir, model_parallel=mp,
                      param_sharder=sharder, mesh=mesh,
                      **trainer_kwargs(cfg))
    eval_params = ((lambda p: unstack_pipeline_stages(p)) if pp > 1
                   else (lambda p: p))
    trainer.fit(
        int(cfg.get("epochs", 5)),
        make_batches("train", True),
        valid_fn=lambda p: valid_ppl(eval_params(p), "valid"),
    )
    cache.save()
    params = eval_params(trainer.load_checkpoint("best"))
    summary = {"test_PPL": valid_ppl(params, "test")}

    # Continuation generation from the first half (reference
    # train_slm.py:95-123), vocoded through the codec, then scored with the
    # generation battery UTMOS/DNSMOS/ASR-PPL/SpkSim(gen vs prompt)
    # (reference train_slm.py:192-213; Rec/Ref control rows :199-217 under
    # compute_ref_metrics). Metrics are config-gated — absent weights just
    # skip that row.
    if cfg.get("generate", True):
        from audiocodecs_tpu.downstream.recipes.quality import (
            PairBattery,
            reconcile_length,
            trim_row,
        )

        gen_frames = int(cfg.get("gen_frames", 8))
        battery = PairBattery(cfg, sample_rate,
                              want=("utmos", "dnsmos", "spk", "ppl"))
        compute_ref = bool(cfg.get("compute_ref_metrics", False))
        gen_fn = jax.jit(
            lambda p, pr, k: llama_generate(
                p, lcfg, pr, gen_frames * K, k,
                top_p=float(cfg.get("top_p", 0.9)),
                temperature=float(cfg.get("temperature", 1.0)),
            )
        )
        gen_dir = os.path.join(out_dir, "generated")
        os.makedirs(gen_dir, exist_ok=True)
        max_batches = int(cfg.get("gen_batches", 0)) or (1 << 30)
        n_gen = total_gen = 0
        loader = BucketedLoader(
            rows["test"], sample_rate, **loader_kwargs(cfg),
        )
        for bi, batch in enumerate(loader):
            if bi >= max_batches:
                break
            flat, _mask = encode_batch(batch)
            toks_full = cache.get_batch(batch["ids"])
            # prompt length ≡ 1 (mod K): position 0 is BOS, content frames
            # start at 1, so a frame-aligned continuation is len = m·K + 1.
            L = flat.shape[1]
            prompt_len = (min(L // 2, 64) // K) * K + 1
            prompt_frames = (prompt_len - 1) // K
            gen_toks, _ = gen_fn(params, jnp.asarray(flat[:, :prompt_len]),
                                 jax.random.PRNGKey(1 + bi))
            grid = np.clip(np.asarray(gen_toks), 0, C - 1)
            grid = grid.reshape(grid.shape[0], -1, K)
            gen_sig = np.asarray(codec.toks_to_sig(jnp.asarray(grid)))
            sig_np = np.asarray(batch["sig"])
            lens = np.asarray(batch["length"])
            # task-rate samples per token frame, from this batch's encode
            hop = max(sig_np.shape[1] // max(toks_full.shape[1], 1), 1)
            prompt_sig = sig_np[:, : prompt_frames * hop]
            rec_np = None
            if compute_ref:
                rec = np.asarray(codec.toks_to_sig(
                    jnp.asarray(toks_full), jnp.asarray(lens)))
                rec_np = reconcile_length(rec, sig_np.shape[1])
            for i, uid in enumerate(batch["ids"]):
                total_gen += 1
                g, p_ = gen_sig[i], prompt_sig[i]
                hyp = np.concatenate([p_, g])  # prompt + continuation
                # generated-continuation rows: UTMOS/DNSMOS on the
                # continuation alone, SpkSim continuation-vs-prompt, PPL
                # on the spliced signal (reference train_slm.py:192-196)
                battery.score_single(g, uid=uid)
                if battery.quality["spk"] is not None:
                    battery.add("SpkSim", battery.quality["spk"].metric(
                        g[None], p_[None], sample_rate)[0])
                if battery.quality["ppl"] is not None:
                    battery.add("Perplexity", battery.quality["ppl"].metric(
                        [hyp], sample_rate)[0])
                if n_gen < int(cfg.get("save_gen_audios", 4)):
                    write_wav(os.path.join(gen_dir, f"{uid}_gen.wav"), g,
                              sample_rate)
                    n_gen += 1
                if compute_ref:
                    r = trim_row(rec_np[i], lens[i])
                    s = trim_row(sig_np[i], lens[i])
                    battery.score_pair(r, s, prefix="Rec", uid=uid)
                    battery.score_single(s, prefix="Ref", uid=uid)
                    if battery.quality["ppl"] is not None:
                        battery.add("RefPerplexity", battery.quality[
                            "ppl"].metric([s], sample_rate)[0])
        summary["generated"] = total_gen
        summary.update(battery.summary())
        battery.write_stats(out_dir)

    # Likelihood-based speaker/continuation consistency (reference
    # train_slm.py:125-157: 2×2 likelihood comparison — the model should
    # assign higher likelihood to an utterance's own continuation than to
    # another utterance's).
    if cfg.get("consistency_eval", True):
        batches = list(make_batches("test", False)())
        if batches:
            flats = jnp.concatenate([b["flat"] for b in batches])[:8]
            masks = jnp.concatenate([b["mask"] for b in batches])[:8]
            B, L = flats.shape
            if B >= 2:
                half = max(K + 1, (L // 2) // K * K)

                @jax.jit
                def half_nll(params, prompt_flat, cont_flat, cont_mask):
                    combo = jnp.concatenate(
                        [prompt_flat[:, :half], cont_flat[:, half:]], axis=1
                    )
                    m = jnp.concatenate(
                        [jnp.zeros_like(cont_mask[:, :half]),
                         cont_mask[:, half:]], axis=1
                    )
                    return nll(params, combo, m)

                errs = 0
                for i in range(B):
                    j = (i + 1) % B
                    own = float(half_nll(params, flats[i : i + 1],
                                         flats[i : i + 1], masks[i : i + 1]))
                    cross = float(half_nll(params, flats[j : j + 1],
                                           flats[i : i + 1], masks[i : i + 1]))
                    errs += int(cross <= own)
                summary["consistency_ER"] = errs / B

    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary


def main(argv=None):
    from audiocodecs_tpu.downstream.config import parse_cli
    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg, _ = parse_cli(argv if argv is not None else sys.argv[1:])
    cfg = prepare_data(cfg)
    print(json.dumps(run_slm(cfg), indent=2, default=float))
    return 0


if __name__ == "__main__":
    sys.exit(main())
