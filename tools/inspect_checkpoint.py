"""Checkpoint structure inspector — makes the first networked conversion of
a new vendor family a mapping task instead of a reverse-engineering one.

    python tools/inspect_checkpoint.py <ckpt.pt> [--depth 3] [--json out]

Groups a torch-loadable state dict (or nested dict of state dicts) into a
module tree with per-subtree parameter counts and leaf shapes, flags
weight-norm pairs and LSTM layers, and — when the family is known — diffs
the observed keys against the documented schema in
``audiocodecs_tpu.convert.zoo`` (``--family speechtokenizer`` etc.), so
schema drift shows up as two explicit lists (missing / unexpected).
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def load_state_dicts(path: str) -> dict:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: not a dict checkpoint")
    # nested dict-of-state-dicts (e.g. BigCodec {CodecEnc, generator})
    if obj and all(isinstance(v, dict) for v in obj.values()):
        return {k: {kk: tuple(vv.shape) for kk, vv in v.items()
                    if hasattr(vv, "shape")} for k, v in obj.items()}
    if "state_dict" in obj:
        obj = obj["state_dict"]
    return {"": {k: tuple(v.shape) for k, v in obj.items()
                 if hasattr(v, "shape")}}


def summarize(shapes: dict, depth: int = 3) -> dict:
    tree: dict = defaultdict(lambda: {"params": 0, "leaves": 0,
                                      "examples": []})
    for key, shape in shapes.items():
        parts = key.split(".")
        prefix = ".".join(parts[:depth])
        n = 1
        for s in shape:
            n *= s
        node = tree[prefix]
        node["params"] += n
        node["leaves"] += 1
        if len(node["examples"]) < 3:
            node["examples"].append(f"{key} {list(shape)}")
    return dict(tree)


def annotate(shapes: dict) -> list:
    notes = []
    roots = {k.rsplit(".", 1)[0] for k in shapes}
    for root in sorted(roots):
        if f"{root}.weight_g" in shapes and f"{root}.weight_v" in shapes:
            notes.append(f"weight-norm conv: {root} "
                         f"{list(shapes[f'{root}.weight_v'])}")
        if f"{root}.weight_ih_l0" in shapes:
            rev = f"{root}.weight_ih_l0_reverse" in shapes
            notes.append(f"LSTM at {root} (bidirectional={rev})")
        if root.endswith("_codebook") and f"{root}.embed" in shapes:
            notes.append(f"EMA-VQ codebook: {root}.embed "
                         f"{list(shapes[f'{root}.embed'])}")
    return notes


def diff_vs_schema(shapes: dict, family: str, cfg=None) -> dict:
    """Diff observed checkpoint shapes against the family's documented
    schema. ``cfg`` overrides the model config (tests pass tiny configs;
    the CLI always diffs against ``default_model_config()`` — the shape a
    real vendor checkpoint should have)."""
    from audiocodecs_tpu.convert import zoo

    models = {
        "speechtokenizer": ("audiocodecs_tpu.models.speechtokenizer",
                            "SpeechTokenizer"),
        "past": ("audiocodecs_tpu.models.past", "PAST"),
        "wavtokenizer": ("audiocodecs_tpu.models.wavtokenizer",
                         "WavTokenizer"),
        "bigcodec": ("audiocodecs_tpu.models.bigcodec", "BigCodec"),
        "xcodec2": ("audiocodecs_tpu.models.xcodec2", "XCodec2"),
        "stablecodec": ("audiocodecs_tpu.models.stablecodec", "StableCodec"),
        "nanocodec": ("audiocodecs_tpu.models.nanocodec", "NanoCodec"),
        "audiodec": ("audiocodecs_tpu.models.audiodec", "AudioDec"),
        "focalcodec": ("audiocodecs_tpu.models.focalcodec", "FocalCodec"),
        "magicodec": ("audiocodecs_tpu.models.magicodec", "MagiCodec"),
        "bicodec": ("audiocodecs_tpu.models.bicodec", "BiCodec"),
        "hilcodec": ("audiocodecs_tpu.models.hilcodec", "HILCodec"),
        "dycast": ("audiocodecs_tpu.models.dycast", "DyCAST"),
    }

    def _schema_for(name):
        import importlib

        mod, cls = models[name]
        c = cfg if cfg is not None else getattr(
            importlib.import_module(mod), cls).default_model_config()
        return getattr(zoo, f"{name}_schema")(c)

    # SemantiCodec's LDM decode chain lives in convert.ldm (CompVis /
    # HiFi-GAN namings), diffed against the full-checkpoint layout.
    def _ldm_schemas(name):
        import dataclasses

        from audiocodecs_tpu.convert import ldm
        from audiocodecs_tpu.models.semanticodec import SemantiCodec

        cfg = SemantiCodec.default_model_config()
        cfg = dataclasses.replace(cfg, decoder_variant="ldm")
        if name == "semanticodec-ldm":
            out = {f"first_stage_model.{k}": v
                   for k, v in ldm.vae_schema(cfg.vae_cfg).items()}
            out.update({f"model.diffusion_model.{k}": v
                        for k, v in ldm.unet_schema(cfg.unet()).items()})
            out["scale_factor"] = ()
            return out
        return ldm.hifigan_schema(cfg.vocoder_cfg)

    def _diff(schema, obs):
        return {
            "missing": sorted(set(schema) - set(obs)),
            "unexpected": sorted(set(obs) - set(schema)),
            "shape_mismatch": sorted(
                k for k in set(schema) & set(obs)
                if tuple(schema[k]) != obs[k]),
        }

    if family == "utmos":
        # two documented candidate layouts (hub = what the reference
        # torch.hub-loads; lightning = the original training ckpt) —
        # report the closer one
        from audiocodecs_tpu.downstream.metrics.utmos import (
            UTMOSConfig,
            utmos_schema,
        )

        c = cfg if cfg is not None else UTMOSConfig()
        obs = shapes.get("", {}) or next(iter(shapes.values()))
        best = None
        for layout in ("hub", "lightning"):
            d = dict(_diff(utmos_schema(c, layout=layout), obs),
                     layout=layout)
            score = len(d["missing"]) + len(d["unexpected"])
            if best is None or score < best[0]:
                best = (score, d)
        return best[1]
    if family in ("semanticodec-ldm", "hifigan"):
        schema = _ldm_schemas(family)
        obs = shapes.get("", {}) or next(iter(shapes.values()))
        return _diff(schema, obs)
    if family not in models:
        raise SystemExit(
            f"unknown --family {family!r}; choose from "
            f"{sorted(models) + ['semanticodec-ldm', 'hifigan', 'utmos']}")
    schema = _schema_for(family)
    if family == "bigcodec":  # two-part schema vs two-part checkpoint
        out = {}
        for part, s in schema.items():
            obs = shapes.get(part, {})
            out[part] = {
                "missing": sorted(set(s) - set(obs)),
                "unexpected": sorted(set(obs) - set(s)),
                "shape_mismatch": sorted(
                    k for k in set(s) & set(obs) if tuple(s[k]) != obs[k]),
            }
        return out
    obs = shapes.get("", {}) or next(iter(shapes.values()))
    return {
        "missing": sorted(set(schema) - set(obs)),
        "unexpected": sorted(set(obs) - set(schema)),
        "shape_mismatch": sorted(
            k for k in set(schema) & set(obs)
            if tuple(schema[k]) != obs[k]),
    }


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print(__doc__)
        return 2
    path = argv[0]

    def arg(name, default, cast=str):
        return (cast(argv[argv.index(name) + 1]) if name in argv else default)

    depth = arg("--depth", 3, int)
    shapes = load_state_dicts(path)
    report = {}
    for part, sd in shapes.items():
        label = part or "(root)"
        report[label] = {
            "num_keys": len(sd),
            "tree": summarize(sd, depth),
            "notes": annotate(sd),
        }
    family = arg("--family", None)
    if family:
        report["schema_diff"] = diff_vs_schema(shapes, family)
    out = arg("--json", None)
    text = json.dumps(report, indent=2)
    if out:
        with open(out, "w") as f:
            f.write(text)
        print(f"wrote {out}")
    else:
        print(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
