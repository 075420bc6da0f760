"""Real-checkpoint diff readiness for the LOW-confidence converter families.

Each family whose vendor key naming is a documented guess (StableCodec /
MagiCodec / HILCodec / DyCAST / UTMOS, ``docs/CONVERTERS.md``) must be
diffable against a real checkpoint with ONE command:

    python tools/inspect_checkpoint.py ckpt.pt --family <name>

These fixtures pin that pipeline end-to-end offline: a torch checkpoint
synthesized in the documented schema produces an EMPTY diff, and every
drift mode (renamed key, extra key, shape change) is reported explicitly —
so the first networked conversion is a mapping task, not detective work.
"""

import dataclasses
import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from inspect_checkpoint import (  # noqa: E402
    diff_vs_schema,
    load_state_dicts,
    main as inspect_main,
)


def _tiny_cfgs():
    from audiocodecs_tpu.downstream.metrics.utmos import UTMOSConfig
    from audiocodecs_tpu.models.dycast import DyCASTModelConfig
    from audiocodecs_tpu.models.hilcodec import HILCodecModelConfig
    from audiocodecs_tpu.models.magicodec import MagiCodecModelConfig
    from audiocodecs_tpu.models.stablecodec import StableCodec
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    tiny_wavlm = WavLMConfig(hidden_size=16, num_layers=2, num_heads=2,
                             intermediate_size=32, conv_dim=(8, 8),
                             conv_kernel=(10, 4), conv_stride=(5, 2))
    return {
        "stablecodec": dataclasses.replace(
            StableCodec.default_model_config(bottleneck=(2, 15625)),
            patch=8, dim=16, depth_outer=2, depth_inner=1, num_heads=2),
        "magicodec": MagiCodecModelConfig(
            hop_length=8, dim=16, depth=2, num_heads=2, codebook_size=64,
            codebook_dim=8),
        "hilcodec": HILCodecModelConfig(
            sampling_rate=800, channels=4, max_channels=16, strides=(4, 2),
            emb_dim=16, codebook_size=8, num_quantizers=2),
        "dycast": DyCASTModelConfig(
            num_channels=4, max_segments=16, max_duration=8,
            wavlm=tiny_wavlm, wavlm_layer=1, vocoder_filters=4,
            vocoder_ratios=(5, 2), use_retriever=True,
            retriever_bank_size=8),
        "utmos": UTMOSConfig(ssl=tiny_wavlm, emb_dim=4, num_domains=2,
                             num_judges=5, blstm_hidden=8, proj_hidden=16,
                             judge_id=1),
    }


def _schema(family, cfg):
    if family == "utmos":
        from audiocodecs_tpu.downstream.metrics.utmos import utmos_schema

        return utmos_schema(cfg)
    from audiocodecs_tpu.convert import zoo

    return getattr(zoo, f"{family}_schema")(cfg)


LOW_FAMILIES = ["stablecodec", "magicodec", "hilcodec", "dycast", "utmos"]


@pytest.mark.parametrize("family", LOW_FAMILIES)
def test_schema_diff_one_command(family, tmp_path):
    """Synthesized schema checkpoint → empty diff; every drift mode is
    reported (the exact workflow ``docs/CONVERTERS.md`` prescribes before
    a real conversion)."""
    cfg = _tiny_cfgs()[family]
    schema = _schema(family, cfg)
    assert schema, family

    sd = {k: torch.zeros(shape) for k, shape in schema.items()}
    ckpt = tmp_path / f"{family}.pt"
    torch.save(sd, str(ckpt))

    shapes = load_state_dicts(str(ckpt))
    diff = diff_vs_schema(shapes, family, cfg=cfg)
    empty = {"missing": [], "unexpected": [], "shape_mismatch": []}
    assert {k: diff[k] for k in empty} == empty, (
        f"{family}: documented schema does not round-trip through the "
        f"inspector: {json.dumps(diff)[:500]}")

    # drift mode 1+2: a renamed key shows up as missing AND unexpected
    key = sorted(schema)[0]
    drifted = dict(sd)
    drifted[f"vendor_renamed.{key}"] = drifted.pop(key)
    torch.save(drifted, str(ckpt))
    diff = diff_vs_schema(load_state_dicts(str(ckpt)), family, cfg=cfg)
    assert diff["missing"] == [key]
    assert diff["unexpected"] == [f"vendor_renamed.{key}"]

    # drift mode 3: a reshaped tensor is flagged by name
    reshaped = dict(sd)
    reshaped[key] = torch.zeros(tuple(s + 1 for s in schema[key]) or (1,))
    torch.save(reshaped, str(ckpt))
    diff = diff_vs_schema(load_state_dicts(str(ckpt)), family, cfg=cfg)
    assert key in diff["shape_mismatch"] or key in diff["unexpected"]


def test_inspect_cli_family_diff(tmp_path, monkeypatch):
    """The one-command CLI surface itself: argv parsing, --family diff,
    --json report (in-process with a tiny default config so no full-size
    checkpoint is synthesized)."""
    from audiocodecs_tpu.models.hilcodec import HILCodec

    cfg = _tiny_cfgs()["hilcodec"]
    monkeypatch.setattr(HILCodec, "default_model_config",
                        classmethod(lambda cls, *a, **k: cfg))
    sd = {k: torch.zeros(shape)
          for k, shape in _schema("hilcodec", cfg).items()}
    ckpt = tmp_path / "hilcodec.pt"
    out = tmp_path / "report.json"
    torch.save(sd, str(ckpt))

    rc = inspect_main([str(ckpt), "--family", "hilcodec",
                       "--json", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["schema_diff"] == {
        "missing": [], "unexpected": [], "shape_mismatch": []}
    assert report["(root)"]["num_keys"] == len(sd)


def test_inspect_cli_utmos_family(tmp_path, monkeypatch):
    """UTMOS (the one LOW family that previously had no inspect-diff
    partner) is reachable through --family utmos."""
    import audiocodecs_tpu.downstream.metrics.utmos as um

    cfg = _tiny_cfgs()["utmos"]
    monkeypatch.setattr(um, "UTMOSConfig", lambda: cfg)
    sd = {k: torch.zeros(shape) for k, shape in _schema("utmos", cfg).items()}
    ckpt = tmp_path / "utmos.pt"
    out = tmp_path / "report.json"
    torch.save(sd, str(ckpt))

    rc = inspect_main([str(ckpt), "--family", "utmos", "--json", str(out)])
    assert rc == 0
    report = json.loads(out.read_text())
    assert report["schema_diff"] == {
        "missing": [], "unexpected": [], "shape_mismatch": [],
        "layout": "hub"}


def test_inspect_utmos_lightning_layout(tmp_path):
    import audiocodecs_tpu.downstream.metrics.utmos as um

    cfg = _tiny_cfgs()["utmos"]
    sd = {k: torch.zeros(shape)
          for k, shape in um.utmos_schema(cfg, layout="lightning").items()}
    ckpt = tmp_path / "utmos_lightning.pt"
    torch.save(sd, str(ckpt))
    diff = diff_vs_schema(load_state_dicts(str(ckpt)), "utmos", cfg=cfg)
    assert diff == {"missing": [], "unexpected": [], "shape_mismatch": [],
                    "layout": "lightning"}
