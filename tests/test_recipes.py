"""End-to-end recipe smoke tests on a tiny codec + synthetic corpus.

System-level coverage the reference lacks entirely (its 'tests' are manual
__main__ blocks, SURVEY §4): every task recipe runs train→eval on a tiny
synthetic dataset with a small EnCodec variant, asserting outputs exist and
losses are finite.
"""

import json
import os

import numpy as np
import pytest

from audiocodecs_tpu.downstream.datasets.synthetic import prepare_synthetic

TINY_CODEC = {
    "name": "encodec",
    "orig_sample_rate": 16000,
    "num_codebooks": 2,
    "model_overrides": {
        "sampling_rate": 16000,
        "num_filters": 4,
        "hidden_size": 16,
        "upsampling_ratios": [20, 16],  # 2 stages, same hop 320 → fast compiles
        "codebook_size": 32,
        "codebook_dim": 16,
        "num_quantizers": 4,
    },
}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    manifests = prepare_synthetic(str(d), sample_rate=16000, num_utts=6,
                                  min_seconds=0.3, max_seconds=0.8)
    return d, manifests


def base_cfg(corpus, out, **kw):
    d, manifests = corpus
    cfg = {
        "sample_rate": 16000,
        "codec": dict(TINY_CODEC),
        "train_csv": manifests["train"],
        "valid_csv": manifests["valid"],
        "test_csv": manifests["test"],
        "output_folder": str(out),
        "batch_size": 2,
        "num_length_buckets": 2,
        "epochs": 1,
        "seed": 0,
    }
    cfg.update(kw)
    return cfg


@pytest.mark.quick
def test_sr_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.sr import run_sr

    summary = run_sr(base_cfg(corpus, tmp_path / "sr", test_batch_size=2))
    assert np.isfinite(summary["SISNR"])
    assert summary["RTF"] > 0 and summary["iRTF"] > 0
    assert os.path.exists(tmp_path / "sr" / "summary.json")
    # full first-party battery is on by default (ref test_sr.py:102-143)
    for key in ("STOI", "PESQ", "MelD", "STFTD", "DNSMOS"):
        assert key in summary, key
    assert 1.0 <= summary["PESQ"] <= 4.65
    assert 1.0 <= summary["DNSMOS"] <= 5.0


def test_sr_recipe_control_rows_and_noisy_input(corpus, tmp_path):
    """compute_ref_metrics adds Rec/Ref/Orig control rows; an in_wav
    manifest column switches to noisy-in/clean-out evaluation
    (reference test_sr.py:44-51,115-143)."""
    from audiocodecs_tpu.downstream.datasets.manifest import (
        read_manifest,
        write_manifest,
    )
    from audiocodecs_tpu.downstream.recipes.sr import run_sr
    from audiocodecs_tpu.utils.audio import read_wav, write_wav

    cfg = base_cfg(corpus, tmp_path / "sr_ctrl", test_batch_size=2,
                   compute_ref_metrics=True, save_audios=True)
    rows = read_manifest(cfg["test_csv"])[:2]
    rng = np.random.default_rng(0)
    for r in rows:
        sig, sr = read_wav(r["wav"])
        noisy = sig[0] + 0.05 * rng.standard_normal(sig.shape[-1])
        in_path = str(tmp_path / f"{r['ID']}_noisy.wav")
        write_wav(in_path, noisy.astype(np.float32), sr)
        r["in_wav"] = in_path
    noisy_csv = str(tmp_path / "noisy_test.csv")
    write_manifest(noisy_csv, rows)
    cfg["test_csv"] = noisy_csv

    summary = run_sr(cfg)
    for key in ("RecSISNR", "OrigSISNR", "RecPESQ", "OrigPESQ",
                "RecDNSMOS", "RefDNSMOS", "OrigDNSMOS"):
        assert key in summary and np.isfinite(summary[key]), key
    # identity control: Orig rows compare noisy-in vs clean-out, so the
    # noisy input scores below the clean reference's own resynthesis ceiling
    assert summary["OrigSISNR"] < 40.0
    uid = rows[0]["ID"]
    for tag in ("hyp", "rec", "ref", "in"):
        assert os.path.exists(tmp_path / "sr_ctrl" / "audios"
                              / f"{uid}_{tag}.wav"), tag


def test_sr_recipe_first_party_dwer(corpus, tmp_path):
    """whisper_checkpoint= wires the on-device JAX dWER into the SR
    battery (torch-free at metric time)."""
    import json

    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    from audiocodecs_tpu.convert.whisper import (
        convert_whisper_state_dict,
        whisper_config_from_hf,
    )
    from audiocodecs_tpu.downstream.recipes.sr import run_sr
    from audiocodecs_tpu.utils.bytebpe import bytes_to_unicode
    from audiocodecs_tpu.utils.checkpoint import save_params

    b2u = bytes_to_unicode()
    vocab = {b2u[b]: b for b in range(256)}
    vocab["<|endoftext|>"] = len(vocab)
    base = len(vocab)
    vocab["<|startoftranscript|>"] = base
    vocab["<|notimestamps|>"] = base + 1
    hf_cfg = HFConfig(
        vocab_size=len(vocab), num_mel_bins=80, d_model=32,
        encoder_layers=1, encoder_attention_heads=4, decoder_layers=1,
        decoder_attention_heads=4, encoder_ffn_dim=48, decoder_ffn_dim=48,
        max_source_positions=1500, max_target_positions=48,
        eos_token_id=vocab["<|endoftext|>"], decoder_start_token_id=base,
        pad_token_id=0, bos_token_id=0, dropout=0.0,
        attention_dropout=0.0, activation_dropout=0.0,
    )
    torch.manual_seed(0)
    model = WhisperForConditionalGeneration(hf_cfg).eval()
    wcfg = whisper_config_from_hf(hf_cfg)
    wdir = tmp_path / "whisper"
    wdir.mkdir()
    save_params(str(wdir / "whisper.npz"),
                convert_whisper_state_dict(model.state_dict(), wcfg))
    (wdir / "vocab.json").write_text(json.dumps(vocab))
    (wdir / "config.json").write_text(json.dumps(
        {hf: getattr(hf_cfg, hf)
         for hf in type(wcfg)._HF_FIELDS.values()}))

    summary = run_sr(base_cfg(
        corpus, tmp_path / "sr_dwer", test_batch_size=2,
        whisper_checkpoint=str(wdir / "whisper.npz"),
        whisper_tokenizer=str(wdir)))
    assert "dWER" in summary and np.isfinite(summary["dWER"])


def test_classification_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.classification import (
        run_classification,
    )

    summary = run_classification(
        base_cfg(corpus, tmp_path / "ic", label_field="utt_label",
                 probe_hidden=16, embedding_dim_probe=16)
    )
    assert 0.0 <= summary["test_ER"] <= 1.0


def test_asr_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.asr import run_asr

    summary = run_asr(
        base_cfg(corpus, tmp_path / "asr", probe_hidden=16,
                 embedding_dim_probe=16, max_label_len=32)
    )
    assert 0.0 <= summary["test_WER"] <= 2.0


def test_asr_recipe_augmented(corpus, tmp_path):
    """augment: true applies DropFreq/DropChunk to train waveforms and
    bypasses the token cache for train batches (reference
    train_asr.py:46-61); eval batches still cache."""
    from audiocodecs_tpu.downstream.cache import TokenCache
    from audiocodecs_tpu.downstream.recipes.asr import run_asr

    out = tmp_path / "asr_aug"
    summary = run_asr(
        base_cfg(corpus, out, probe_hidden=16, embedding_dim_probe=16,
                 max_label_len=32, augment=True, augment_prob=1.0,
                 drop_count_low=20, drop_count_high=30)
    )
    assert 0.0 <= summary["test_WER"] <= 2.0
    # the saved cache must hold only UNaugmented (valid/test) encodes —
    # no train-split utterance id may have been cached
    import csv

    cache = TokenCache(str(out / "token_cache.npz"))
    d, manifests = corpus
    with open(manifests["train"]) as f:
        train_ids = [row["ID"] for row in csv.DictReader(f)]
    assert train_ids and all(i not in cache for i in train_ids)
    # the valid split is encoded un-augmented during fit → it IS cached
    with open(manifests["valid"]) as f:
        valid_ids = [row["ID"] for row in csv.DictReader(f)]
    assert any(i in cache for i in valid_ids)


def test_asr_recipe_bpe(corpus, tmp_path):
    """CTC over manifest-trained subwords (reference default token_type:
    bpe / num_tokens — asr.yaml:54-55); head sizes itself from the
    tokenizer vocab."""
    from audiocodecs_tpu.downstream.recipes.asr import run_asr

    summary = run_asr(
        base_cfg(corpus, tmp_path / "asr_bpe", probe_hidden=16,
                 embedding_dim_probe=16, max_label_len=32,
                 token_type="bpe", num_tokens=64)
    )
    assert 0.0 <= summary["test_WER"] <= 2.0
    assert summary["vocab_size"] <= 64


def test_slm_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.slm import run_slm

    summary = run_slm(
        base_cfg(corpus, tmp_path / "slm", d_model=32, num_layers=1,
                 num_heads=2, num_kv_heads=1, ffn_dim=64, max_flat_len=128,
                 gen_frames=3)
    )
    assert np.isfinite(summary["test_PPL"])
    assert summary["generated"] > 0


def test_slm_recipe_tensor_parallel(corpus, tmp_path):
    """model_parallel: 2 trains the SAME step Megatron-sharded over a
    (data=4, model=2) mesh of the 8 virtual devices; the resulting PPL
    must match the dp-only run (identical math, GSPMD-inserted
    collectives)."""
    import jax
    from audiocodecs_tpu.downstream.recipes.slm import run_slm

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    kw = dict(d_model=32, num_layers=1, num_heads=2, num_kv_heads=1,
              ffn_dim=64, max_flat_len=128, gen_frames=0, generate=False)
    ref = run_slm(base_cfg(corpus, tmp_path / "slm_dp", **kw))
    tp = run_slm(base_cfg(corpus, tmp_path / "slm_tp", model_parallel=2,
                          **kw))
    assert np.isfinite(tp["test_PPL"])
    assert abs(tp["test_PPL"] - ref["test_PPL"]) < 0.05 * ref["test_PPL"], (
        tp["test_PPL"], ref["test_PPL"])


def test_slm_recipe_expert_parallel(corpus, tmp_path):
    """moe_experts: 4 + expert_parallel: 2 trains a switch-MoE decoder
    with the stacked experts sharded over the model mesh axis. The math is
    identical to the unsharded MoE run (same dense dispatch/combine
    einsums, GSPMD-partitioned), so PPL must match."""
    import jax
    from audiocodecs_tpu.downstream.recipes.slm import run_slm

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    kw = dict(d_model=32, num_layers=1, num_heads=2, num_kv_heads=1,
              ffn_dim=64, max_flat_len=128, gen_frames=0, generate=False,
              consistency_eval=False, moe_experts=4,
              moe_capacity_factor=4.0)
    ref = run_slm(base_cfg(corpus, tmp_path / "slm_moe_dense", **kw))
    ep = run_slm(base_cfg(corpus, tmp_path / "slm_moe_ep",
                          expert_parallel=2, **kw))
    assert np.isfinite(ep["test_PPL"])
    assert abs(ep["test_PPL"] - ref["test_PPL"]) < 0.05 * ref["test_PPL"], (
        ep["test_PPL"], ref["test_PPL"])


def test_slm_recipe_pipeline_parallel(corpus, tmp_path):
    """pipeline_parallel: 2 trains the decoder as a 2-stage GPipe schedule
    on the model axis (activations over lax.ppermute); the resulting PPL
    must match the dp-only run — identical math, pipelined execution."""
    import jax
    from audiocodecs_tpu.downstream.recipes.slm import run_slm

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    kw = dict(d_model=32, num_layers=2, num_heads=2, num_kv_heads=1,
              ffn_dim=64, max_flat_len=128, gen_frames=0, generate=False,
              consistency_eval=False, batch_size=4)
    ref = run_slm(base_cfg(corpus, tmp_path / "slm_nopp", **kw))
    pipe = run_slm(base_cfg(corpus, tmp_path / "slm_pp",
                            pipeline_parallel=2, num_microbatches=1, **kw))
    assert np.isfinite(pipe["test_PPL"])
    assert abs(pipe["test_PPL"] - ref["test_PPL"]) < 0.05 * ref["test_PPL"], (
        pipe["test_PPL"], ref["test_PPL"])


def test_se_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.se import run_se

    summary = run_se(
        base_cfg(corpus, tmp_path / "se", d_model=32, num_layers=1,
                 num_heads=2, ffn_dim=64, compute_ref_metrics=True)
    )
    assert 0.0 <= summary["test_TER"] <= 1.0
    # full signal battery vs clean (reference train_se.py:153-182):
    # first-party DSP rows + DNSMOS + Rec/Ref control rows
    for key in ("STOI", "PESQ", "MelD", "STFTD", "DNSMOS", "RecSTOI",
                "RecDNSMOS", "RefDNSMOS"):
        assert key in summary and np.isfinite(summary[key]), key


def test_ss_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.ss import run_ss

    summary = run_ss(
        base_cfg(corpus, tmp_path / "ss", d_model=32, num_layers=1,
                 num_heads=2, ffn_dim=64)
    )
    assert np.isfinite(summary["test_PIT_loss"])
    # per-speaker battery on the best-permutation pairing
    for key in ("STOI", "PESQ", "MelD", "STFTD", "DNSMOS"):
        assert key in summary and np.isfinite(summary[key]), key


def test_tts_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.tts import run_tts

    summary = run_tts(
        base_cfg(corpus, tmp_path / "tts", d_model=32, num_layers=1,
                 num_heads=2, num_kv_heads=1, ffn_dim=64, max_text_len=16,
                 max_flat_len=128, gen_frames=3)
    )
    assert np.isfinite(summary["test_loss"])


def test_slm_generation_battery(corpus, tmp_path):
    """SLM test-time generation is scored with the battery (reference
    train_slm.py:192-213): DNSMOS (shipped params → auto-on) over the
    generated continuation, plus Rec/Ref control rows + Rec DSP metrics
    under compute_ref_metrics."""
    from audiocodecs_tpu.downstream.recipes.slm import run_slm

    summary = run_slm(
        base_cfg(corpus, tmp_path / "slm_batt", d_model=32, num_layers=1,
                 num_heads=2, num_kv_heads=1, ffn_dim=64, max_flat_len=128,
                 gen_frames=3, gen_batches=1, compute_ref_metrics=True)
    )
    for key in ("DNSMOS", "RecDNSMOS", "RefDNSMOS", "RecSTOI", "RecPESQ",
                "RecMelD", "RecSTFTD"):
        assert key in summary and np.isfinite(summary[key]), key
    # Ref rows score the ORIGINAL signal: 1 ≤ MOS ≤ 5 sanity band
    assert 1.0 <= summary["RefDNSMOS"] <= 5.0


def test_tts_generation_battery(corpus, tmp_path):
    """TTS generated speech is scored hyp-vs-reference (reference
    train_tts.py:205-230): DNSMOS rows + Rec/Ref controls."""
    from audiocodecs_tpu.downstream.recipes.tts import run_tts

    summary = run_tts(
        base_cfg(corpus, tmp_path / "tts_batt", d_model=32, num_layers=1,
                 num_heads=2, num_kv_heads=1, ffn_dim=64, max_text_len=16,
                 max_flat_len=128, gen_frames=3, gen_batches=1,
                 compute_ref_metrics=True)
    )
    for key in ("DNSMOS", "RecDNSMOS", "RefDNSMOS"):
        assert key in summary and np.isfinite(summary[key]), key
    assert summary["generated"] > 0


def test_vc_recipe(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.vc import run_vc

    summary = run_vc(base_cfg(corpus, tmp_path / "vc", max_pairs=2,
                              compute_ref_metrics=True))
    assert summary["pairs"] == 2 and np.isfinite(summary["MelD_vs_source"])
    # converted-speech battery vs source + Rec/Ref controls
    for key in ("STOI", "PESQ", "MelD", "STFTD", "DNSMOS", "RecDNSMOS",
                "RefDNSMOS"):
        assert key in summary and np.isfinite(summary[key]), key


def test_token_cache_roundtrip(tmp_path):
    from audiocodecs_tpu.downstream.cache import TokenCache

    c = TokenCache(str(tmp_path / "c.npz"))
    toks = np.arange(24).reshape(2, 4, 3)
    c.put_batch(["a", "b"], toks, tok_lengths=[1.0, 0.5])
    got = c.get_batch(["a", "b"])
    assert got.shape == (2, 4, 3)
    assert (got[0] == toks[0]).all()
    assert (got[1, :2] == toks[1, :2]).all() and (got[1, 2:] == 0).all()
    assert c.get_batch(["a", "missing"]) is None
    c.save()
    c2 = TokenCache(str(tmp_path / "c.npz"))
    assert len(c2) == 2


def test_se_recipe_conformer(corpus, tmp_path):
    from audiocodecs_tpu.downstream.recipes.se import run_se

    summary = run_se(
        base_cfg(corpus, tmp_path / "se_conf", d_model=32, num_layers=1,
                 num_heads=2, encoder_type="conformer", conv_kernel=7)
    )
    assert 0.0 <= summary["test_TER"] <= 1.0


def test_tts_speaker_conditioned(corpus, tmp_path):
    """TTS with the first-party x-vector speaker prompt (reference
    train_tts.py:96-101): converted WavLMForXVector checkpoint → cached
    per-utterance embeddings → conditioning at train AND generation time."""
    torch = pytest.importorskip("torch")
    import dataclasses

    from transformers import WavLMConfig as HFWavLMConfig
    from transformers import WavLMForXVector

    from audiocodecs_tpu.convert.wavlm import wavlm_config_from_hf
    from audiocodecs_tpu.downstream.models.speaker_encoder import (
        XVectorConfig,
        convert_xvector_state_dict,
    )
    from audiocodecs_tpu.downstream.recipes.tts import run_tts
    from audiocodecs_tpu.utils.checkpoint import save_params

    torch.manual_seed(0)
    hf_cfg = HFWavLMConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=4,
        intermediate_size=64, conv_dim=[16, 16, 16],
        conv_kernel=[10, 3, 2], conv_stride=[5, 2, 2], conv_bias=False,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        num_buckets=32, max_bucket_distance=50, do_stable_layer_norm=False,
        feat_extract_norm="group", layerdrop=0.0,
        tdnn_dim=[24, 24, 24, 24, 48], tdnn_kernel=[5, 3, 3, 1, 1],
        tdnn_dilation=[1, 2, 3, 1, 1], xvector_output_dim=16,
        use_weighted_layer_sum=True,
    )
    xv_cfg = XVectorConfig(
        wavlm=wavlm_config_from_hf(hf_cfg),
        tdnn_dim=tuple(hf_cfg.tdnn_dim), tdnn_kernel=tuple(hf_cfg.tdnn_kernel),
        tdnn_dilation=tuple(hf_cfg.tdnn_dilation),
        xvector_dim=hf_cfg.xvector_output_dim, use_weighted_layer_sum=True,
    )
    model = WavLMForXVector(hf_cfg).eval()
    ckpt = tmp_path / "xv.npz"
    save_params(str(ckpt), convert_xvector_state_dict(model.state_dict(),
                                                      xv_cfg))

    summary = run_tts(
        base_cfg(corpus, tmp_path / "tts_spk", d_model=32, num_layers=1,
                 num_heads=2, num_kv_heads=1, ffn_dim=64, max_text_len=16,
                 max_flat_len=128, gen_frames=3,
                 speaker_encoder_checkpoint=str(ckpt),
                 speaker_encoder_config={
                     "wavlm": dataclasses.asdict(xv_cfg.wavlm),
                     "tdnn_dim": list(xv_cfg.tdnn_dim),
                     "tdnn_kernel": list(xv_cfg.tdnn_kernel),
                     "tdnn_dilation": list(xv_cfg.tdnn_dilation),
                     "xvector_dim": xv_cfg.xvector_dim,
                 })
    )
    assert np.isfinite(summary["test_loss"])
    assert summary["generated"] > 0


def test_quality_ppl_gate_needs_transcription_backend():
    """An LM without a Whisper backend must NOT build the PPL metric —
    recipes score signals, and the LM alone would raise mid-eval after
    training completed (review finding)."""
    from audiocodecs_tpu.downstream.recipes.quality import (
        build_quality_metrics,
    )

    q = build_quality_metrics({"lm_checkpoint": "/nonexistent.npz"}, 16000,
                              want=("ppl",))
    assert q["ppl"] is None


def test_prepare_data_corpus_shape_passthrough(tmp_path):
    """Dataset-yaml corpus knobs (speakers/classes/lengths/seed) reach
    prepare_synthetic, so hparams/datasets/synthetic-quality.yaml fully
    determines the RESULTS.md corpus on a clean box."""
    import csv

    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg = {
        "dataset": "synthetic",
        "sample_rate": 16000,
        "prep_dir": str(tmp_path / "prep"),
        "train_csv": "{prep_dir}/train.csv",
        "valid_csv": "{prep_dir}/valid.csv",
        "test_csv": "{prep_dir}/test.csv",
        "num_utterances": 10,
        "num_speakers": 5,
        "num_classes": 2,
        "min_seconds": 0.3,
        "max_seconds": 0.4,
        "corpus_seed": 7,
    }
    out = prepare_data(cfg)
    rows = list(csv.DictReader(open(out["train_csv"])))
    rows += list(csv.DictReader(open(out["valid_csv"])))
    rows += list(csv.DictReader(open(out["test_csv"])))
    assert len(rows) == 10
    assert {r["spk_id"] for r in rows} == {f"spk{i}" for i in range(5)}
    assert {r["utt_label"] for r in rows} <= {"class0", "class1"}
    assert all(0.3 <= float(r["duration"]) <= 0.45 for r in rows)


def test_ss_task_merges_with_every_dataset_axis():
    """'num_speakers' is owned by the DATASET axis (SS source count);
    the synthetic corpus renames its population knob to
    'corpus_speakers' so ss.yaml merges cleanly with every dataset yaml
    (the r5 quality loop hit `duplicate config key 'num_speakers'`)."""
    import glob

    from audiocodecs_tpu.downstream.config import parse_cli

    for ds in sorted(glob.glob("hparams/datasets/*.yaml")):
        cfg, _ = parse_cli(["hparams/tasks/ss.yaml", ds])
        # the recipe's separation-source default applies when the
        # dataset doesn't define it (synthetic mixes 2 sources)
        assert int(cfg.get("num_speakers", 2)) >= 1, ds


def test_corpus_speakers_knob_reaches_generator(tmp_path):
    """'corpus_speakers' flows into the synthetic generator exactly like
    the legacy in-dataset 'num_speakers' name did."""
    import csv

    from audiocodecs_tpu.downstream.recipes.common import prepare_data

    cfg = {
        "dataset": "synthetic",
        "sample_rate": 16000,
        "prep_dir": str(tmp_path / "prep"),
        "train_csv": "{prep_dir}/train.csv",
        "valid_csv": "{prep_dir}/valid.csv",
        "test_csv": "{prep_dir}/test.csv",
        "num_utterances": 8,
        "corpus_speakers": 3,
        "min_seconds": 0.3,
        "max_seconds": 0.4,
    }
    out = prepare_data(cfg)
    rows = list(csv.DictReader(open(out["train_csv"])))
    rows += list(csv.DictReader(open(out["valid_csv"])))
    rows += list(csv.DictReader(open(out["test_csv"])))
    assert {r["spk_id"] for r in rows} == {f"spk{i}" for i in range(3)}
