"""Codec model zoo.

Import codecs lazily to keep startup light:

    from audiocodecs_tpu.models.encodec import Encodec
"""

_CODEC_REGISTRY = {
    "encodec": ("audiocodecs_tpu.models.encodec", "Encodec"),
    "dac": ("audiocodecs_tpu.models.dac", "DAC"),
    "mimi": ("audiocodecs_tpu.models.mimi", "Mimi"),
    "speechtokenizer": ("audiocodecs_tpu.models.speechtokenizer", "SpeechTokenizer"),
    "wavtokenizer": ("audiocodecs_tpu.models.wavtokenizer", "WavTokenizer"),
    "past": ("audiocodecs_tpu.models.past", "PAST"),
    "audiodec": ("audiocodecs_tpu.models.audiodec", "AudioDec"),
    "hilcodec": ("audiocodecs_tpu.models.hilcodec", "HILCodec"),
    "bigcodec": ("audiocodecs_tpu.models.bigcodec", "BigCodec"),
    "magicodec": ("audiocodecs_tpu.models.magicodec", "MagiCodec"),
    "nanocodec": ("audiocodecs_tpu.models.nanocodec", "NanoCodec"),
    "stablecodec": ("audiocodecs_tpu.models.stablecodec", "StableCodec"),
    "wavlm_kmeans": ("audiocodecs_tpu.models.wavlm_kmeans", "WavLMKmeans"),
    "focalcodec": ("audiocodecs_tpu.models.focalcodec", "FocalCodec"),
    "bicodec": ("audiocodecs_tpu.models.bicodec", "BiCodec"),
    "xcodec2": ("audiocodecs_tpu.models.xcodec2", "XCodec2"),
    "dycast": ("audiocodecs_tpu.models.dycast", "DyCAST"),
    "semanticodec": ("audiocodecs_tpu.models.semanticodec", "SemantiCodec"),
}


def get_codec_class(name: str):
    """Resolve a codec class by registry name (lazy import)."""
    import importlib

    try:
        module, cls = _CODEC_REGISTRY[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown codec {name!r}; available: {', '.join(sorted(_CODEC_REGISTRY))}"
        ) from None
    return getattr(importlib.import_module(module), cls)


def available_codecs():
    return sorted(_CODEC_REGISTRY)
