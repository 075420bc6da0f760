"""Key-map overlay tests (convert/overlay.py).

The [C]-graded families (StableCodec / MagiCodec / HILCodec / DyCAST /
UTMOS — see docs/CONVERTERS.md provenance) carry repo-invented tower key
names; the first real checkpoint will arrive with different names. These
tests prove the promised workflow: perturb a synthesized vendor checkpoint
the way a real vendor might (renamed prefixes, odd leaf names, extra
buffers), write a DATA-ONLY overlay, and convert through it to the exact
same params as the unperturbed checkpoint — no code edit.

The reference never needs this because it runs each vendor's own loader
(e.g. ``/root/reference/audiocodecs/stablecodec.py:48-68``).
"""

import json

import numpy as np
import pytest

import jax

from audiocodecs_tpu.convert import zoo
from audiocodecs_tpu.convert.overlay import (
    apply_key_map,
    load_key_map,
    propose_key_map,
)
from tests.test_zoo_converters import synth_state_dict, tree_spec


# --------------------------------------------------------------------- #
# unit semantics
# --------------------------------------------------------------------- #

def test_apply_none_is_noop_copy():
    sd = {"a.b": 1}
    out = apply_key_map(sd, None)
    assert out == sd and out is not sd


def test_rename_beats_prefix_and_prefix_is_longest_match():
    sd = {"enc.x": 1, "enc.y": 2, "enc.deep.z": 3}
    km = {"rename": {"enc.x": "special.x"},
          "prefix": {"enc.": "encoder.", "enc.deep.": "decoder.deep."}}
    out = apply_key_map(sd, km)
    assert out == {"special.x": 1, "encoder.y": 2, "decoder.deep.z": 3}


def test_regex_and_drop_wildcard():
    sd = {"blocks_0.w": 1, "blocks_3.w": 2, "opt.step": 3, "opt.lr": 4,
          "epoch": 5}
    km = {"drop": ["opt.*", "epoch"],
          "regex": [[r"^blocks_(\d+)\.", r"blocks.\1."]]}
    assert apply_key_map(sd, km) == {"blocks.0.w": 1, "blocks.3.w": 2}


def test_collision_raises():
    with pytest.raises(ValueError, match="both map to"):
        apply_key_map({"a": 1, "b": 2}, {"rename": {"a": "c", "b": "c"}})


def test_typoed_exact_entry_raises():
    with pytest.raises(ValueError, match="match no"):
        apply_key_map({"a": 1}, {"rename": {"a_typo": "b"}})
    with pytest.raises(ValueError, match="match no"):
        apply_key_map({"a": 1}, {"drop": ["nope"]})


def test_load_key_map_validates_sections(tmp_path):
    p = tmp_path / "km.json"
    p.write_text(json.dumps({"rename": {}, "_unresolved": {"x": {}},
                             "_note": "hi"}))
    assert load_key_map(str(p))["rename"] == {}
    p.write_text(json.dumps({"renmae": {}}))
    with pytest.raises(ValueError, match="unknown overlay sections"):
        load_key_map(str(p))
    p.write_text(json.dumps(["not", "an", "object"]))
    with pytest.raises(ValueError, match="JSON object"):
        load_key_map(str(p))


def test_key_map_accepts_json_path(tmp_path):
    p = tmp_path / "km.json"
    p.write_text(json.dumps({"prefix": {"v.": "s."}}))
    assert apply_key_map({"v.w": 7}, str(p)) == {"s.w": 7}


# --------------------------------------------------------------------- #
# per-family fixture: perturbed checkpoint + overlay == clean checkpoint
# --------------------------------------------------------------------- #

def _assert_trees_equal(a, b, what):
    sa, sb = tree_spec(a), tree_spec(b)
    assert set(sa) == set(sb), f"{what}: paths differ"
    flat_a, flat_b = {}, {}

    def _flat(tree, path, out):
        if isinstance(tree, dict):
            for k, v in tree.items():
                _flat(v, f"{path}/{k}", out)
        elif isinstance(tree, (list, tuple)):
            for i, v in enumerate(tree):
                _flat(v, f"{path}/{i}", out)
        else:
            out[path] = np.asarray(tree)

    _flat(a, "", flat_a)
    _flat(b, "", flat_b)
    for p in flat_a:
        np.testing.assert_array_equal(flat_a[p], flat_b[p],
                                      err_msg=f"{what}: {p}")


def _perturb(sd, prefix_map, leaf_renames=(), junk=("opt_state.step",)):
    """Vendor-ify a synthesized checkpoint: renamed prefixes + odd leaf
    names + training junk. Returns (perturbed_sd, inverting key_map)."""
    out, rename = {}, {}
    for k, v in sd.items():
        nk = k
        for src, dst in prefix_map.items():
            if nk.startswith(src):
                nk = dst + nk[len(src):]
                break
        out[nk] = v
    for schema_key, vendor_key in leaf_renames:
        # leaf renames are expressed on the PERTURBED names
        pk = schema_key
        for src, dst in prefix_map.items():
            if pk.startswith(src):
                pk = dst + pk[len(src):]
                break
        assert pk in out
        out[vendor_key] = out.pop(pk)
        rename[vendor_key] = schema_key
    for j in junk:
        out[j] = np.zeros((1,), np.float32)
    km = {"prefix": {dst: src for src, dst in prefix_map.items()},
          "rename": rename, "drop": list(junk)}
    return out, km


def test_stablecodec_overlay_conversion():
    import dataclasses

    from audiocodecs_tpu.models.stablecodec import StableCodec

    cfg = dataclasses.replace(
        StableCodec.default_model_config(bottleneck=(2, 15625)),
        patch=8, dim=16, depth_outer=2, depth_inner=1, num_heads=2,
    )
    sd = synth_state_dict(zoo.stablecodec_schema(cfg))
    vendor, km = _perturb(
        sd,
        {"encoder.": "model.encoder.", "decoder.": "model.decoder."},
        leaf_renames=[("encoder.patch_embed.weight",
                       "model.encoder.patchify.conv.weight"),
                      ("encoder.patch_embed.bias",
                       "model.encoder.patchify.conv.bias")],
    )
    want = zoo.convert_stablecodec_state_dict(sd, cfg)
    got = zoo.convert_stablecodec_state_dict(vendor, cfg, key_map=km)
    _assert_trees_equal(got, want, "stablecodec overlay")
    # without the overlay the vendor naming must fail loudly, not convert
    with pytest.raises((ValueError, KeyError)):
        zoo.convert_stablecodec_state_dict(vendor, cfg)


def test_magicodec_overlay_conversion():
    from audiocodecs_tpu.models.magicodec import MagiCodecModelConfig

    cfg = MagiCodecModelConfig(hop_length=8, dim=16, depth=2, num_heads=2,
                               codebook_size=64, codebook_dim=8)
    sd = synth_state_dict(zoo.magicodec_schema(cfg))
    vendor, km = _perturb(
        sd,
        {"encoder.transformers.": "encoder.blocks.",
         "decoder.transformers.": "decoder.blocks."},
        leaf_renames=[("quantizer.codebook.weight", "vq.embeddings")],
    )
    want = zoo.convert_magicodec_state_dict(sd, cfg)
    got = zoo.convert_magicodec_state_dict(vendor, cfg, key_map=km)
    _assert_trees_equal(got, want, "magicodec overlay")


def test_hilcodec_overlay_conversion():
    from tests.test_zoo_converters import _tiny_hilcodec_cfg

    cfg = _tiny_hilcodec_cfg()
    sd = synth_state_dict(zoo.hilcodec_schema(cfg))
    vendor, km = _perturb(
        sd, {"encoder.blocks.": "encoder.units.",
             "decoder.blocks.": "decoder.units."})
    want = zoo.convert_hilcodec_state_dict(sd, cfg)
    got = zoo.convert_hilcodec_state_dict(vendor, cfg, key_map=km)
    _assert_trees_equal(got, want, "hilcodec overlay")
    # without the overlay (and without opting into partial) it raises
    with pytest.raises(ValueError, match="tower conversion failed"):
        zoo.convert_hilcodec_state_dict(vendor, cfg, allow_partial=False)


def test_dycast_overlay_conversion():
    from audiocodecs_tpu.models.dycast import DyCASTModelConfig
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    cfg = DyCASTModelConfig(
        num_channels=4, max_segments=16, max_duration=8,
        wavlm=WavLMConfig(hidden_size=16, num_layers=2, num_heads=2,
                          intermediate_size=32,
                          conv_dim=(8, 8), conv_kernel=(10, 4),
                          conv_stride=(5, 2)),
        wavlm_layer=1, vocoder_filters=4, vocoder_ratios=(5, 2),
        use_retriever=True, retriever_bank_size=8)
    sd = synth_state_dict(zoo.dycast_schema(cfg))
    vendor, km = _perturb(
        sd, {"encoder.": "ssl_model.", "decoder.vocoder.": "vocoder."},
        leaf_renames=[("boundary_predictor.head.weight",
                       "boundary_head.weight"),
                      ("boundary_predictor.head.bias",
                       "boundary_head.bias")])
    want = zoo.convert_dycast_state_dict(sd, cfg)
    got = zoo.convert_dycast_state_dict(vendor, cfg, key_map=km)
    _assert_trees_equal(got, want, "dycast overlay")


def test_utmos_overlay_conversion():
    from audiocodecs_tpu.downstream.metrics.utmos import (
        convert_utmos_state_dict,
        utmos_schema,
    )
    from tests.test_utmos import tiny_cfg

    cfg = tiny_cfg()
    sd = {k: np.random.default_rng(0).standard_normal(s).astype(np.float32)
          for k, s in utmos_schema(cfg, layout="hub").items()}
    vendor, km = _perturb(
        sd, {"wav2vec2.encoder.": "ssl.backbone.",
             "wav2vec2.feature_extractor.": "ssl.cnn."},
        leaf_renames=[("domain_emb", "domain_vector"),
                      ("judge_emb", "judge_vector")])
    want = convert_utmos_state_dict(sd, cfg)
    got = convert_utmos_state_dict(vendor, cfg, key_map=km)
    _assert_trees_equal(got, want, "utmos overlay")


def test_focalcodec_overlay_conversion():
    """FocalCodec's converter also carries a diff-first confidence note —
    same overlay seam."""
    from audiocodecs_tpu.models.focalcodec import FocalCodecModelConfig
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    cfg = FocalCodecModelConfig(
        codebook_bits=6,
        wavlm=WavLMConfig(
            hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, conv_dim=(16, 16, 16),
            conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2), conv_bias=True,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_distance=50,
            do_stable_layer_norm=True, feat_extract_norm="layer",
        ),
        wavlm_layer=2, compressor_blocks=2, vocos_dim=8,
        vocos_intermediate_dim=16, vocos_layers=2, n_fft=32, hop_length=8)
    sd = synth_state_dict(zoo.focalcodec_schema(cfg))
    vendor, km = _perturb(sd, {"compressor.": "down_path.",
                               "decompressor.": "up_path."})
    want = zoo.convert_focalcodec_state_dict(sd, cfg)
    got = zoo.convert_focalcodec_state_dict(vendor, cfg, key_map=km)
    _assert_trees_equal(got, want, "focalcodec overlay")


# --------------------------------------------------------------------- #
# propose_key_map: inspector-drafted overlays
# --------------------------------------------------------------------- #

def test_propose_key_map_recovers_prefix_rename():
    """A pure prefix vendor rename must be fully auto-drafted (the tower
    keys share shapes, so this exercises longest-common-suffix
    disambiguation, not just shape matching)."""
    import dataclasses

    from audiocodecs_tpu.models.stablecodec import StableCodec

    cfg = dataclasses.replace(
        StableCodec.default_model_config(bottleneck=(2, 15625)),
        patch=8, dim=16, depth_outer=2, depth_inner=1, num_heads=2,
    )
    schema = zoo.stablecodec_schema(cfg)
    sd = synth_state_dict(schema)
    vendor, _ = _perturb(sd, {"encoder.": "model.enc.",
                              "decoder.": "model.dec."}, junk=())
    observed = {k: np.shape(v) for k, v in vendor.items()}
    km = propose_key_map(schema, observed)
    assert not km.get("_unresolved"), km.get("_unresolved")
    restored = apply_key_map(vendor, km)
    assert set(restored) == set(schema)
    got = zoo.convert_stablecodec_state_dict(vendor, cfg, key_map=km)
    want = zoo.convert_stablecodec_state_dict(sd, cfg)
    _assert_trees_equal(got, want, "proposed overlay")


def test_propose_key_map_flags_ambiguity():
    schema = {"a.w": (4, 4), "b.w": (4, 4)}
    observed = {"x.w": (4, 4), "y.w": (4, 4)}
    km = propose_key_map(schema, observed)
    assert not km.get("rename") and len(km["_unresolved"]) == 2


def test_inspector_emit_key_map_cli(tmp_path):
    """End-to-end: torch-save a perturbed checkpoint, --emit-key-map, then
    convert through the emitted overlay."""
    torch = pytest.importorskip("torch")

    import dataclasses

    from audiocodecs_tpu.models.stablecodec import StableCodec
    from tools.inspect_checkpoint import main as inspect_main

    cfg = dataclasses.replace(
        StableCodec.default_model_config(bottleneck=(2, 15625)),
        patch=8, dim=16, depth_outer=2, depth_inner=1, num_heads=2,
    )
    sd = synth_state_dict(zoo.stablecodec_schema(cfg))
    vendor, _ = _perturb(sd, {"encoder.": "net.enc.",
                              "decoder.": "net.dec."}, junk=())
    ckpt = tmp_path / "vendor.pt"
    torch.save({k: torch.from_numpy(v) for k, v in vendor.items()},
               str(ckpt))
    out = tmp_path / "overlay.json"
    # the CLI diffs against default_model_config(); shapes then differ from
    # our tiny cfg, so drive resolve_schema+propose directly the way the
    # CLI does, through the same code path with cfg injected
    from tools.inspect_checkpoint import load_state_dicts, resolve_schema

    shapes = load_state_dicts(str(ckpt))
    schema, obs = resolve_schema(shapes, "stablecodec", cfg=cfg)
    km = propose_key_map(schema, obs)
    out.write_text(json.dumps(km))
    got = zoo.convert_stablecodec_state_dict(vendor, cfg,
                                             key_map=str(out))
    want = zoo.convert_stablecodec_state_dict(sd, cfg)
    _assert_trees_equal(got, want, "emitted overlay")
    assert inspect_main is not None  # CLI entry stays importable
