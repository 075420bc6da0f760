"""Checkpoint conversion / zoo warm-up CLI.

Equivalent of the reference's ``downstream/download.py`` (reference
``download.py:48-257``: instantiate every codec + metric once, tolerant of
failures, for offline compute nodes) plus the conversion step our framework
needs: PyTorch checkpoints → ``.npz`` parameter pytrees.

    # convert a local HF checkpoint directory (no network needed)
    python tools/convert_checkpoints.py convert encodec /path/to/encodec_24khz out.npz

    # instantiate every codec family once (random weights) as a smoke test
    python tools/convert_checkpoints.py warmup

Staged metric-model one-liners (run the moment weights are reachable;
keep the HF directory next to the .npz — it supplies tokenizer/config):

    python tools/convert_checkpoints.py convert whisper /path/to/whisper-small whisper.npz
    python tools/convert_checkpoints.py convert gpt2 /path/to/gpt2 gpt2.npz
    python tools/convert_checkpoints.py convert utmos /path/to/utmos22_strong.pt utmos.npz

Then: ``make_dwer_jax_metric("whisper.npz", "/path/to/whisper-small")``,
``make_perplexity_metric(checkpoint="gpt2.npz", tokenizer_path=...)``,
``make_utmos_jax_metric("utmos.npz")``.
"""

from __future__ import annotations

import sys


CONVERTERS = {
    "encodec": (
        "transformers:EncodecModel",
        "audiocodecs_tpu.convert.encodec",
        "convert_encodec_state_dict",
        "encodec_config_from_hf",
    ),
    "dac": (
        "transformers:DacModel",
        "audiocodecs_tpu.convert.dac",
        "convert_dac_state_dict",
        "dac_config_from_hf",
    ),
    "mimi": (
        "transformers:MimiModel",
        "audiocodecs_tpu.convert.mimi",
        "convert_mimi_state_dict",
        "mimi_config_from_hf",
    ),
    "wavlm": (
        "transformers:WavLMModel",
        "audiocodecs_tpu.convert.wavlm",
        "convert_wavlm_state_dict",
        "wavlm_config_from_hf",
    ),
    # metric models (first-party JAX forwards; see module docstring for
    # the staged one-liners)
    "whisper": (
        "transformers:WhisperForConditionalGeneration",
        "audiocodecs_tpu.convert.whisper",
        "convert_whisper_state_dict",
        "whisper_config_from_hf",
    ),
    "gpt2": (
        "transformers:GPT2LMHeadModel",
        "audiocodecs_tpu.convert.gpt2",
        "convert_gpt2_state_dict",
        "gpt2_config_from_hf",
    ),
}

# Vendor (non-HF-transformers) checkpoints: a torch.load-able state dict
# (or dict of state dicts) mapped by a schema converter. Each entry is
# (codec module, model-config factory, converter fn in convert.zoo).
# `src` for these is the checkpoint FILE (e.g. SpeechTokenizer.pt), matching
# the reference's loaders (speechtokenizer.py:52-60, past.py:57,
# wavtokenizer.py:70-76).
VENDOR_CONVERTERS = {
    "speechtokenizer": (
        "audiocodecs_tpu.models.speechtokenizer:SpeechTokenizer",
        "convert_speechtokenizer_state_dict",
    ),
    "past": (
        "audiocodecs_tpu.models.past:PAST",
        "convert_past_state_dict",
    ),
    "wavtokenizer": (
        "audiocodecs_tpu.models.wavtokenizer:WavTokenizer",
        "convert_wavtokenizer_state_dict",
    ),
    # Alethia/BigCodec releases a dict of two state dicts
    # (CodecEnc/generator); the converter takes it whole.
    "bigcodec": (
        "audiocodecs_tpu.models.bigcodec:BigCodec",
        "convert_bigcodec_state_dict",
    ),
    # HKUST-Audio/xcodec2: one fused state dict (semantic_model.* +
    # CodecEnc.* + fc_* + generator.*).
    "xcodec2": (
        "audiocodecs_tpu.models.xcodec2:XCodec2",
        "convert_xcodec2_state_dict",
    ),
    "stablecodec": (
        "audiocodecs_tpu.models.stablecodec:StableCodec",
        "convert_stablecodec_state_dict",
    ),
    "nanocodec": (
        "audiocodecs_tpu.models.nanocodec:NanoCodec",
        "convert_nanocodec_state_dict",
    ),
    "audiodec": (
        "audiocodecs_tpu.models.audiodec:AudioDec",
        "convert_audiodec_state_dict",
    ),
    "focalcodec": (
        "audiocodecs_tpu.models.focalcodec:FocalCodec",
        "convert_focalcodec_state_dict",
    ),
    "magicodec": (
        "audiocodecs_tpu.models.magicodec:MagiCodec",
        "convert_magicodec_state_dict",
    ),
    # Spark-TTS BiCodec (the wav2vec2-xlsr extractor ships separately in
    # the model repo; convert it via the python API's w2v_sd argument).
    "bicodec": (
        "audiocodecs_tpu.models.bicodec:BiCodec",
        "convert_bicodec_state_dict",
    ),
    # full documented tower schema; degrades to codebooks-only (the
    # reference-pinned interface) with a warning on schema drift
    "hilcodec": (
        "audiocodecs_tpu.models.hilcodec:HILCodec",
        "convert_hilcodec_state_dict",
    ),
    # documented-guess schema (vendor schema unreleased; strict, diff a
    # real checkpoint with inspect_checkpoint.py --family dycast first)
    "dycast": (
        "audiocodecs_tpu.models.dycast:DyCAST",
        "convert_dycast_state_dict",
    ),
    # SemantiCodec LDM decoder (first_stage_model.* + model.diffusion_model.*
    # + scale_factor) -> {vae, unet, latent_scale} sub-tree
    "semanticodec-ldm": (
        "audiocodecs_tpu.models.semanticodec:SemantiCodec",
        "convert_semanticodec_ldm_state_dict",
    ),
    # SemantiCodec / AudioLDM HiFi-GAN vocoder file -> {"vocoder": ...}
    "semanticodec-vocoder": (
        "audiocodecs_tpu.models.semanticodec:SemantiCodec",
        "convert_semanticodec_vocoder_state_dict",
    ),
}


def convert_vendor(name: str, src: str, out: str,
                   key_map: str | None = None) -> int:
    """Convert a vendor checkpoint file (torch.load state dict).

    ``key_map``: optional overlay JSON (vendor-key -> schema-key renames,
    see ``audiocodecs_tpu/convert/overlay.py``) — the data-only fix for
    the [C]-graded families whose real key names deviate from the
    documented schema. Applied before conversion for EVERY vendor family.
    """
    import importlib

    import numpy as np
    import torch

    mod_path, converter_name = VENDOR_CONVERTERS[name]
    lib, cls_name = mod_path.split(":")
    cls = getattr(importlib.import_module(lib), cls_name)
    cfg = cls.default_model_config()
    sd = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    if key_map is not None:
        from audiocodecs_tpu.convert.overlay import apply_key_map

        sd = apply_key_map(sd, key_map)
    zoo = importlib.import_module("audiocodecs_tpu.convert.zoo")
    params = getattr(zoo, converter_name)(sd, cfg)

    from audiocodecs_tpu.utils.checkpoint import save_params

    save_params(out, params)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"{name}: {src} -> {out} ({n / 1e6:.2f} M params)")
    return 0


def convert_utmos(src: str, out: str,
                  key_map: str | None = None) -> int:
    """Convert a UTMOS22-strong checkpoint file (torch.hub tarepan/SpeechMOS
    download or a sarulab-speech lightning checkpoint — layout
    auto-detected, see ``utmos_schema``)."""
    import numpy as np
    import torch

    from audiocodecs_tpu.downstream.metrics.utmos import (
        UTMOSConfig,
        convert_utmos_state_dict,
    )
    from audiocodecs_tpu.utils.checkpoint import save_params

    sd = torch.load(src, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params = convert_utmos_state_dict(sd, UTMOSConfig(), key_map=key_map)
    save_params(out, params)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"utmos: {src} -> {out} ({n / 1e6:.2f} M params)")
    return 0


def convert_dnsmos(src: str, out: str) -> int:
    from audiocodecs_tpu.downstream.metrics.dnsmos import save_dnsmos_params

    flat = save_dnsmos_params(src, out)
    import numpy as np

    n = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"dnsmos: {src} -> {out} ({n / 1e3:.1f} K params)")
    return 0


def convert_xvector(src: str, out: str) -> int:
    """Convert a WavLMForXVector checkpoint (speaker encoder)."""
    import numpy as np
    from transformers import WavLMForXVector

    from audiocodecs_tpu.convert.wavlm import wavlm_config_from_hf
    from audiocodecs_tpu.downstream.models.speaker_encoder import (
        XVectorConfig,
        convert_xvector_state_dict,
    )
    from audiocodecs_tpu.utils.checkpoint import save_params

    model = WavLMForXVector.from_pretrained(src)
    hf = model.config
    cfg = XVectorConfig(
        wavlm=wavlm_config_from_hf(hf),
        tdnn_dim=tuple(hf.tdnn_dim),
        tdnn_kernel=tuple(hf.tdnn_kernel),
        tdnn_dilation=tuple(hf.tdnn_dilation),
        xvector_dim=hf.xvector_output_dim,
        use_weighted_layer_sum=hf.use_weighted_layer_sum,
    )
    params = convert_xvector_state_dict(model.state_dict(), cfg)
    save_params(out, params)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"wavlm_xvector: {src} -> {out} ({n / 1e6:.2f} M params)")
    return 0


def convert(name: str, src: str, out: str) -> int:
    import importlib

    import numpy as np

    if name not in CONVERTERS:
        print(f"no converter for {name!r}; available: "
              f"{sorted(CONVERTERS) + sorted(VENDOR_CONVERTERS)}"
              " + dnsmos, wavlm_xvector, utmos")
        return 2
    loader, mod_name, fn_name, cfg_fn_name = CONVERTERS[name]
    lib, cls_name = loader.split(":")
    cls = getattr(importlib.import_module(lib), cls_name)
    model = cls.from_pretrained(src)
    mod = importlib.import_module(mod_name)
    cfg = getattr(mod, cfg_fn_name)(model.config)
    params = getattr(mod, fn_name)(model.state_dict(), cfg)

    from audiocodecs_tpu.utils.checkpoint import save_params

    save_params(out, params)
    n = sum(int(np.prod(np.shape(x))) for x in _leaves(params))
    print(f"{name}: {src} -> {out} ({n / 1e6:.2f} M params)")
    return 0


def _leaves(tree):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _leaves(v)
    elif isinstance(tree, (list, tuple)):
        for v in tree:
            yield from _leaves(v)
    else:
        yield tree


def warmup() -> int:
    """Instantiate every registered codec once (tolerant, like the
    reference's download.py)."""
    import traceback

    from audiocodecs_tpu.models import available_codecs, get_codec_class

    failures = 0
    for name in available_codecs():
        try:
            cls = get_codec_class(name)
            codec = cls(sample_rate=16000, mode="encode")
            print(f"  {name}: ok (K={codec.config.num_codebooks}, "
                  f"C={codec.config.vocab_size})")
        except Exception:
            failures += 1
            print(f"  {name}: FAILED")
            traceback.print_exc(limit=1)
    print(f"warmup: {len(available_codecs()) - failures}/"
          f"{len(available_codecs())} families instantiated")

    # First-party metrics (reference download.py also instantiates every
    # metric once, download.py:200-257; external-model metrics are gated
    # and skipped here by design).
    import numpy as np

    from audiocodecs_tpu.downstream.metrics.base import MetricStats
    from audiocodecs_tpu.downstream.metrics.codebook_util import (
        CodebookUtilization,
    )
    from audiocodecs_tpu.downstream.metrics.dsp import (
        mel_distance,
        si_snr,
        stft_distance,
    )
    from audiocodecs_tpu.downstream.metrics.stoi import stoi

    x = np.random.default_rng(0).standard_normal((1, 4000)).astype("float32")
    checks = {
        "SISNR": lambda: float(np.asarray(si_snr(x, x))[0]),
        "MelD": lambda: float(np.asarray(mel_distance(x, x, 16000))[0]),
        "STFTD": lambda: float(np.asarray(stft_distance(x, x))[0]),
        "STOI": lambda: float(stoi(x[0], x[0], 16000)),
        "CodebookUtil": lambda: CodebookUtilization(2, 8) and 0.0,
        "MetricStats": lambda: MetricStats(lambda h, r: [0.0]) and 0.0,
    }
    for name, fn in checks.items():
        try:
            fn()
            print(f"  metric {name}: ok")
        except Exception:
            failures += 1
            print(f"  metric {name}: FAILED")
            traceback.print_exc(limit=1)
    return 1 if failures else 0


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in ("convert", "warmup"):
        print(__doc__)
        return 2
    if argv[0] == "warmup":
        return warmup()
    key_map = None
    if "--key-map" in argv:
        i = argv.index("--key-map")
        if i + 1 >= len(argv):
            print("--key-map requires a JSON path")
            return 2
        key_map = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    if len(argv) != 4:
        print("usage: convert <family> <src_checkpoint_dir> <out.npz> "
              "[--key-map overlay.json]")
        return 2
    if argv[1] == "wavlm_xvector":
        return convert_xvector(argv[2], argv[3])
    if argv[1] == "dnsmos":
        return convert_dnsmos(argv[2], argv[3])
    if argv[1] == "utmos":
        return convert_utmos(argv[2], argv[3], key_map=key_map)
    if argv[1] in VENDOR_CONVERTERS:
        return convert_vendor(argv[1], argv[2], argv[3], key_map=key_map)
    if key_map is not None:
        print(f"--key-map is for vendor-schema families, not {argv[1]!r} "
              "(HF-oracle converters read transformers models directly)")
        return 2
    return convert(argv[1], argv[2], argv[3])


if __name__ == "__main__":
    sys.exit(main())
