"""Legacy monolithic hparams bridge (reference ``hparams/_legacy/*``).

The reference keeps pre-3-axis hyperpyyaml files (one per task x dataset
x codec, e.g. ``downstream/hparams/_legacy/asr/LibriSpeech/encodec.yaml``)
whose tagged blocks construct torch modules in-config. The bridge
(``downstream/legacy.py``) parses that tag surface as data, resolves
``!ref``, and translates onto our 3-axis key surface — these tests pin
the resolution semantics, the translation table, and (when the reference
checkout is present) a real reference legacy file end-to-end.
"""

import os

import pytest

from audiocodecs_tpu.downstream.config import load_config, parse_cli
from audiocodecs_tpu.downstream.legacy import (
    is_legacy_yaml, load_legacy_config, translate_legacy)

FIXTURE = """\
experiment_name: myexp
dataset: LibriSpeech
task: asr
seed: 7
__set_seed: !apply:torch.manual_seed [!ref <seed>]
data_folder: !PLACEHOLDER
output_folder: !ref results/<task>/<dataset>/<experiment_name>/<seed>
save_folder: !ref <output_folder>/save
cache_folder: !name:huggingface_hub.constants.HUGGINGFACE_HUB_CACHE
train_csv: [!ref <save_folder>/train-a.csv, !ref <save_folder>/train-b.csv]
num_epochs: 42
train_batch_size: 16
hidden_size: 512
patient: 1
annealing_factor: 0.9
improvement_threshold: 0.0025
num_tokens: 29
embedding_dim: 128
blank_id: !ref <num_tokens>
double_tokens: !ref <num_tokens> * 2
augment: True
augment_prob: 0.75
sample_rate: 16000
num_codebooks: 2
mode: encode

drop_freq: !new:speechbrain.augment.time_domain.DropFreq
    drop_freq_low: 0
    drop_freq_high: 1
    drop_freq_count_low: 1
    drop_freq_count_high: 3
    drop_freq_width: 0.05

drop_chunk: !new:speechbrain.augment.time_domain.DropChunk
    drop_length_low: 1
    drop_length_high: 5
    drop_count_low: 1000
    drop_count_high: 2000

augmentation: !new:speechbrain.augment.augmenter.Augmenter
    augment_prob: !ref <augment_prob>
    augmentations: [!ref <drop_freq>, !ref <drop_chunk>]

codec: !new:audiocodecs.Encodec
    sample_rate: !ref <sample_rate>
    orig_sample_rate: 24000
    num_codebooks: !ref <num_codebooks>
    mode: !ref <mode>

embedding: !new:models.multihead.MultiHeadEmbedding
    vocab_size: 1024
"""


@pytest.fixture()
def legacy_path(tmp_path):
    p = tmp_path / "legacy.yaml"
    p.write_text(FIXTURE)
    return str(p)


def test_sniffer():
    assert is_legacy_yaml(FIXTURE)
    assert not is_legacy_yaml("task: asr\nepochs: 3\n")


def test_ref_resolution(legacy_path):
    cfg = load_legacy_config(legacy_path)
    # type-preserving single-token copy
    assert cfg["blank_id"] == 29 and isinstance(cfg["blank_id"], int)
    # string interpolation incl. chained refs
    assert cfg["output_folder"] == "results/asr/LibriSpeech/myexp/7"
    assert cfg["save_folder"] == "results/asr/LibriSpeech/myexp/7/save"
    assert cfg["train_csv"] == [
        "results/asr/LibriSpeech/myexp/7/save/train-a.csv",
        "results/asr/LibriSpeech/myexp/7/save/train-b.csv",
    ]
    # arithmetic (hyperpyyaml `!ref <a> * 2`)
    assert cfg["double_tokens"] == 58


def test_translation(legacy_path):
    out = translate_legacy(load_legacy_config(legacy_path))
    # codec module block → declarative codec block (registry name)
    assert out["codec"] == {"name": "encodec", "orig_sample_rate": 24000,
                            "num_codebooks": 2}
    # run-opt renames
    assert out["epochs"] == 42
    assert out["batch_size"] == 16
    assert out["probe_hidden"] == 512
    assert out["lr_patience"] == 1
    assert out["lr_annealing_factor"] == 0.9
    assert out["embedding_dim_probe"] == 128
    # augmentation knobs lifted out of their module blocks
    assert out["drop_freq_width"] == 0.05
    assert out["drop_count_low"] == 1000
    assert out["augment"] is True and out["augment_prob"] == 0.75
    # placeholder surfaced, not silently None
    assert out["data_folder"] is None
    assert out["legacy_placeholders"] == ["data_folder"]
    # dataset lowercased onto our prep names
    assert out["dataset"] == "librispeech"
    # dropped blocks are recorded, torch-only keys included
    assert set(out["legacy_dropped"]) >= {
        "embedding", "drop_freq", "drop_chunk", "augmentation",
        "__set_seed", "cache_folder", "blank_id"}
    # nothing half-translated leaks through
    assert not any(k.startswith("_legacy") for k in out)


def test_load_config_routes_and_cli_overrides(legacy_path):
    # load_config auto-detects the legacy format
    cfg = load_config(legacy_path)
    assert cfg["codec"]["name"] == "encodec"
    # single-positional CLI usage with the reference's override style
    merged, paths = parse_cli([legacy_path, "--data_folder", "/data/LS"])
    assert paths == [legacy_path]
    assert merged["data_folder"] == "/data/LS"
    assert merged["epochs"] == 42


def test_unresolvable_ref_raises(tmp_path):
    p = tmp_path / "cycle.yaml"
    p.write_text("a: !ref <b>\nb: !ref <a>\n")
    with pytest.raises(ValueError, match="cycle"):
        load_legacy_config(str(p))
    p2 = tmp_path / "missing.yaml"
    p2.write_text("a: !ref <nope>\n")
    with pytest.raises(KeyError, match="nope"):
        load_legacy_config(str(p2))


SMOKE = """\
experiment_name: legacy_smoke
task: ks
seed: 0
label_field: utt_label
data_folder: !PLACEHOLDER
train_csv: !PLACEHOLDER
valid_csv: !PLACEHOLDER
test_csv: !PLACEHOLDER
output_folder: !PLACEHOLDER
num_epochs: 1
train_batch_size: 2
num_length_buckets: 2
hidden_size: 16
embedding_dim: 16
sample_rate: 16000
num_codebooks: 2

codec: !new:audiocodecs.Encodec
    sample_rate: !ref <sample_rate>
    orig_sample_rate: !ref <sample_rate>
    num_codebooks: !ref <num_codebooks>
    model_overrides:
        sampling_rate: 16000
        num_filters: 4
        hidden_size: 16
        upsampling_ratios: [20, 16]
        codebook_size: 32
        codebook_dim: 16
        num_quantizers: 4
"""


def test_legacy_file_drives_a_recipe(tmp_path):
    """A legacy-format monolithic YAML runs a recipe end-to-end through
    the reference's own CLI shape (one positional yaml + --key overrides
    for the placeholders)."""
    from audiocodecs_tpu.downstream.datasets.synthetic import prepare_synthetic
    from audiocodecs_tpu.downstream.recipes.classification import (
        run_classification)

    corpus = tmp_path / "corpus"
    manifests = prepare_synthetic(str(corpus), sample_rate=16000, num_utts=6,
                                  min_seconds=0.3, max_seconds=0.8)
    p = tmp_path / "legacy_smoke.yaml"
    p.write_text(SMOKE)
    merged, _ = parse_cli([
        str(p),
        "--train_csv", manifests["train"],
        "--valid_csv", manifests["valid"],
        "--test_csv", manifests["test"],
        "--output_folder", str(tmp_path / "out"),
        "--data_folder", str(corpus),
    ])
    summary = run_classification(merged)
    assert 0.0 <= summary["test_ER"] <= 1.0


_REF_LEGACY = "/root/reference/downstream/hparams/_legacy/asr/LibriSpeech/encodec.yaml"


_REF_LEGACY_ROOT = "/root/reference/downstream/hparams/_legacy"


@pytest.mark.skipif(not os.path.isdir(_REF_LEGACY_ROOT),
                    reason="reference checkout not present")
def test_reference_legacy_sweep():
    """Every legacy file in the reference checkout parses, resolves, and
    translates to a registry-known codec without errors or leftovers."""
    from audiocodecs_tpu.models import available_codecs

    paths = []
    for root, _, files in os.walk(_REF_LEGACY_ROOT):
        paths += [os.path.join(root, f) for f in files if f.endswith(".yaml")]
    assert len(paths) >= 100  # the reference ships ~110 of these
    names = set(available_codecs())
    for p in paths:
        out = translate_legacy(load_legacy_config(p))
        assert out.get("codec", {}).get("name") in names, p
        assert not any(k.startswith("_legacy") for k in out), p
        assert "task" in out and "dataset" in out, p


@pytest.mark.skipif(not os.path.exists(_REF_LEGACY),
                    reason="reference checkout not present")
def test_reference_legacy_file_end_to_end():
    """The actual reference legacy file translates onto our surface."""
    out = translate_legacy(load_legacy_config(_REF_LEGACY))
    assert out["codec"]["name"] == "encodec"
    assert out["codec"]["orig_sample_rate"] == 24000
    assert out["task"] == "asr" and out["dataset"] == "librispeech"
    assert out["epochs"] == 100 and out["batch_size"] == 16
    assert out["token_type"] == "char" and out["num_tokens"] == 29
    assert "data_folder" in out["legacy_placeholders"]
    assert out["drop_count_low"] == 1000  # lifted from the DropChunk block
    # every code-constructing block was dropped *visibly*
    assert "augmentation" in out["legacy_dropped"]
