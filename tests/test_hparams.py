"""Config-matrix sanity: every codec YAML builds a codec whose K/C match the
declared surface; dataset YAMLs parse; 3-axis merge works for all codecs."""

import glob
import os

import pytest

from audiocodecs_tpu.downstream.config import (
    load_config,
    merge_configs,
)

HP = os.path.join(os.path.dirname(__file__), "..", "hparams")

CODEC_YAMLS = sorted(glob.glob(os.path.join(HP, "codecs", "*.yaml")))
DATASET_YAMLS = sorted(glob.glob(os.path.join(HP, "datasets", "*.yaml")))
TASK_YAMLS = sorted(glob.glob(os.path.join(HP, "tasks", "*.yaml")))


def test_axes_exist():
    assert len(CODEC_YAMLS) >= 18  # one per reference codec family (+vocos)
    # ≥14 dataset variants like the reference (split variants included,
    # reference hparams/datasets/: librispeech-{100,460,960,test,460-spk},
    # voicebank{,-test}, libri{1,2}mix, minimls-test, ...) + synthetic
    assert len(DATASET_YAMLS) >= 15
    assert len(TASK_YAMLS) >= 11  # sr + asr + ic/ks/ser/si + se/ss/slm/tts/vc


@pytest.mark.parametrize("path", DATASET_YAMLS,
                         ids=[os.path.basename(p) for p in DATASET_YAMLS])
def test_dataset_yaml_surface(path):
    cfg = load_config(path)
    assert "dataset" in cfg and "sample_rate" in cfg, path
    assert "test_csv" in cfg, f"{path}: every variant must define test_csv"


def test_split_variants_cover_reference_grid():
    names = {os.path.basename(p)[:-5] for p in DATASET_YAMLS}
    for want in ("librispeech-460", "librispeech-960", "librispeech-test",
                 "librispeech-460-spk", "voicebank-test", "libri1mix-test",
                 "minimls-test"):
        assert want in names, want


@pytest.mark.parametrize("path", CODEC_YAMLS,
                         ids=[os.path.basename(p) for p in CODEC_YAMLS])
def test_codec_yaml_surface(path):
    cfg = load_config(path)
    for key in ("experiment_name", "codec", "num_codebooks", "vocab_size",
                "embedding_dim"):
        assert key in cfg, f"{path} missing {key}"
    from audiocodecs_tpu.models import available_codecs

    assert cfg["codec"]["name"] in available_codecs()


@pytest.mark.parametrize("path", TASK_YAMLS,
                         ids=[os.path.basename(p) for p in TASK_YAMLS])
def test_task_yaml_merges_with_codec_and_dataset(path):
    cfg = merge_configs(
        [load_config(path),
         load_config(os.path.join(HP, "codecs", "encodec.yaml")),
         load_config(os.path.join(HP, "datasets", "synthetic.yaml"))],
        [path, "codec", "dataset"],
    )
    assert "task" in cfg and "codec" in cfg and "sample_rate" in cfg


def test_small_codec_builds_from_yaml():
    """Instantiate one small codec through the full config path."""
    from audiocodecs_tpu.downstream.config import build_codec

    cfg = {
        "codec": {
            "name": "encodec",
            "orig_sample_rate": 16000,
            "num_codebooks": 2,
            "model_overrides": {
                "sampling_rate": 16000, "num_filters": 4, "hidden_size": 16,
                "upsampling_ratios": [4, 2], "codebook_size": 32,
                "codebook_dim": 16, "num_quantizers": 4,
            },
        }
    }
    codec = build_codec(cfg, 16000)
    assert codec.config.num_codebooks == 2
    assert codec.config.vocab_size == 32


def test_parse_cli_typed_overrides(tmp_path):
    """CLI overrides are typed like YAML scalars: ints, floats, lowercase
    booleans (``--flag false`` must NOT survive as a truthy string),
    null/none, quoted strings, dotted paths, and ``--k=v`` syntax."""
    from audiocodecs_tpu.downstream.config import parse_cli

    y = tmp_path / "base.yaml"
    y.write_text("a: 1\nnested:\n  b: 2\n")
    cfg, paths = parse_cli([
        str(y), "--epochs", "3", "--lr", "1e-3", "--generate", "false",
        "--augment", "true", "--note", "hello", "--maybe", "null",
        "--nested.b", "7", "--batch_size=8",
    ])
    assert paths == [str(y)] and cfg["a"] == 1
    assert cfg["epochs"] == 3 and isinstance(cfg["epochs"], int)
    assert abs(cfg["lr"] - 1e-3) < 1e-12
    assert cfg["generate"] is False and cfg["augment"] is True
    assert cfg["note"] == "hello" and cfg["maybe"] is None
    assert cfg["nested"]["b"] == 7 and cfg["batch_size"] == 8


def test_semanticodec_default_decoder_variant_is_ldm():
    """The vendor-true LDM decode chain must stay the user-facing default
    (reference decode path ``semanticodec.py:224-261`` is LDM-only); the
    lightweight "analog" stand-in is opt-in for tests. Pins (a) the
    dataclass default, (b) the registry default config, and (c) that the
    shipped hparams yaml does not silently override it."""
    from audiocodecs_tpu.downstream.config import load_config
    from audiocodecs_tpu.models.semanticodec import (
        SemantiCodec,
        SemantiCodecModelConfig,
    )

    assert SemantiCodecModelConfig().decoder_variant == "ldm"
    assert SemantiCodec.default_model_config(16000).decoder_variant == "ldm"

    cfg = load_config(os.path.join(HP, "codecs", "semanticodec.yaml"))
    overrides = cfg["codec"].get("model_overrides") or {}
    assert overrides.get("decoder_variant", "ldm") == "ldm", (
        "hparams/codecs/semanticodec.yaml must not ship the analog "
        "stand-in as default")
