"""Checkpoint structure inspector — makes the first networked conversion of
a new vendor family a mapping task instead of a reverse-engineering one.

    python tools/inspect_checkpoint.py <ckpt.pt> [--depth 3] [--json out]
        [--family <name>] [--emit-key-map overlay.json]

Groups a torch-loadable state dict (or nested dict of state dicts) into a
module tree with per-subtree parameter counts and leaf shapes, flags
weight-norm pairs and LSTM layers, and — when the family is known — diffs
the observed keys against the documented schema in
``audiocodecs_tpu.convert.zoo`` (``--family speechtokenizer`` etc.), so
schema drift shows up as two explicit lists (missing / unexpected).

``--emit-key-map`` drafts a rename overlay (see
``audiocodecs_tpu/convert/overlay.py``) from that diff by shape-matching:
unique-shape matches become ``rename``/``prefix`` rules; ambiguous keys
land in ``_unresolved`` for the human to finish. Feed the finished file to
``tools/convert_checkpoints.py convert <family> ... --key-map overlay.json``
— the data-only fix for the [C]-graded families (StableCodec / MagiCodec /
HILCodec / DyCAST / UTMOS) whose vendors never published a schema.
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


_MODELS = {
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


def resolve_schema(shapes: dict, family: str, cfg=None):
    """→ (schema {key: shape}, observed {key: shape}) for the family.

    ``cfg`` overrides the model config (tests pass tiny configs; the CLI
    always resolves ``default_model_config()`` — the shape a real vendor
    checkpoint should have). BigCodec is two-part (dict of schemas/obs).
    """
    from audiocodecs_tpu.convert import zoo

    if family == "utmos":
        # two documented candidate layouts (hub = what the reference
        # torch.hub-loads; lightning = the original training ckpt) —
        # pick the closer one
        from audiocodecs_tpu.downstream.metrics.utmos import (
            UTMOSConfig,
            utmos_schema,
        )

        c = cfg if cfg is not None else UTMOSConfig()
        obs = shapes.get("", {}) or next(iter(shapes.values()))
        best = None
        for layout in ("hub", "lightning"):
            schema = utmos_schema(c, layout=layout)
            score = len(set(schema) ^ set(obs))
            if best is None or score < best[0]:
                best = (score, schema, layout)
        return dict(best[1], _layout=best[2]), obs
    if family in ("semanticodec-ldm", "hifigan"):
        import dataclasses

        from audiocodecs_tpu.convert import ldm
        from audiocodecs_tpu.models.semanticodec import SemantiCodec

        c = SemantiCodec.default_model_config()
        c = dataclasses.replace(c, decoder_variant="ldm")
        if family == "semanticodec-ldm":
            schema = {f"first_stage_model.{k}": v
                      for k, v in ldm.vae_schema(c.vae_cfg).items()}
            schema.update({f"model.diffusion_model.{k}": v
                           for k, v in ldm.unet_schema(c.unet()).items()})
            schema["scale_factor"] = ()
        else:
            schema = ldm.hifigan_schema(c.vocoder_cfg)
        obs = shapes.get("", {}) or next(iter(shapes.values()))
        return schema, obs
    if family not in _MODELS:
        raise SystemExit(
            f"unknown --family {family!r}; choose from "
            f"{sorted(_MODELS) + ['semanticodec-ldm', 'hifigan', 'utmos']}")
    import importlib

    mod, cls = _MODELS[family]
    c = cfg if cfg is not None else getattr(
        importlib.import_module(mod), cls).default_model_config()
    schema = getattr(zoo, f"{family}_schema")(c)
    if family == "bigcodec":  # two-part schema vs two-part checkpoint
        return schema, {part: shapes.get(part, {}) for part in schema}
    return schema, shapes.get("", {}) or next(iter(shapes.values()))


def _diff(schema: dict, obs: dict) -> dict:
    return {
        "missing": sorted(k for k in set(schema) - set(obs)
                          if not k.startswith("_")),
        "unexpected": sorted(set(obs) - set(schema)),
        "shape_mismatch": sorted(
            k for k in set(schema) & set(obs)
            if tuple(schema[k]) != tuple(obs[k])),
    }


def diff_vs_schema(shapes: dict, family: str, cfg=None) -> dict:
    """Diff observed checkpoint shapes against the family's documented
    schema (see :func:`resolve_schema` for ``cfg`` semantics)."""
    schema, obs = resolve_schema(shapes, family, cfg)
    if family == "bigcodec":
        return {part: _diff(schema[part], obs[part]) for part in schema}
    d = _diff(schema, obs)
    if "_layout" in schema:
        d["layout"] = schema["_layout"]
    return d


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
    emit = arg("--emit-key-map", None)
    if emit:
        if not family:
            print("--emit-key-map requires --family")
            return 2
        if family == "bigcodec":
            print("--emit-key-map: bigcodec is a two-part checkpoint; "
                  "draft per-part maps manually from schema_diff")
            return 2
        from audiocodecs_tpu.convert.overlay import propose_key_map

        schema, obs = resolve_schema(shapes, family)
        key_map = propose_key_map(
            {k: v for k, v in schema.items() if not k.startswith("_")}, obs)
        with open(emit, "w") as f:
            json.dump(key_map, f, indent=1, sort_keys=True)
        n_ren = len(key_map.get("rename", {}))
        n_pre = len(key_map.get("prefix", {}))
        n_un = len(key_map.get("_unresolved", {}))
        print(f"wrote {emit}: {n_ren} renames, {n_pre} prefix rules, "
              f"{n_un} unresolved (finish those by hand, then convert with "
              f"--key-map {emit})")
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
