"""audiocodecs_tpu — a TPU-native (JAX/XLA/Pallas) neural audio codec framework.

Re-designed from scratch with the same capabilities as the reference
``lucadellalib/audiocodecs`` library (see SURVEY.md): a standardized codec
interface with ``[B, T]`` waveform ↔ ``[B, N, K]`` token ↔ ``[B, N, H]``
feature contracts, a zoo of neural audio codec model families whose weights
are converted from upstream PyTorch checkpoints, and a downstream benchmark
harness.

Unlike the reference (a PyTorch wrapper library), every model here is a
first-party JAX implementation: pure-functional modules over parameter
pytrees, jit-compiled with static shape bucketing, channel-last layouts that
map onto the TPU MXU/VPU, and `jax.sharding` data parallelism instead of DDP.
"""

__version__ = "0.1.0"

from audiocodecs_tpu.codec import Codec, CodecConfig

# Top-level codec classes, same surface as the reference package
# (``/root/reference/audiocodecs/__init__.py:17-39`` exports every family).
# Lazy: importing the package stays light; each class import pulls only its
# own model module.
_CODEC_EXPORTS = {
    "AudioDec": ("audiocodecs_tpu.models.audiodec", "AudioDec"),
    "BiCodec": ("audiocodecs_tpu.models.bicodec", "BiCodec"),
    "BigCodec": ("audiocodecs_tpu.models.bigcodec", "BigCodec"),
    "DAC": ("audiocodecs_tpu.models.dac", "DAC"),
    "DyCAST": ("audiocodecs_tpu.models.dycast", "DyCAST"),
    "Encodec": ("audiocodecs_tpu.models.encodec", "Encodec"),
    "FocalCodec": ("audiocodecs_tpu.models.focalcodec", "FocalCodec"),
    "HILCodec": ("audiocodecs_tpu.models.hilcodec", "HILCodec"),
    "MagiCodec": ("audiocodecs_tpu.models.magicodec", "MagiCodec"),
    "Mimi": ("audiocodecs_tpu.models.mimi", "Mimi"),
    "NanoCodec": ("audiocodecs_tpu.models.nanocodec", "NanoCodec"),
    "PAST": ("audiocodecs_tpu.models.past", "PAST"),
    "SemantiCodec": ("audiocodecs_tpu.models.semanticodec", "SemantiCodec"),
    "SpeechTokenizer": (
        "audiocodecs_tpu.models.speechtokenizer", "SpeechTokenizer"),
    "StableCodec": ("audiocodecs_tpu.models.stablecodec", "StableCodec"),
    "WavLMKmeans": ("audiocodecs_tpu.models.wavlm_kmeans", "WavLMKmeans"),
    "WavTokenizer": ("audiocodecs_tpu.models.wavtokenizer", "WavTokenizer"),
    "XCodec2": ("audiocodecs_tpu.models.xcodec2", "XCodec2"),
}


def __getattr__(name: str):
    if name in _CODEC_EXPORTS:
        import importlib

        module, cls = _CODEC_EXPORTS[name]
        return getattr(importlib.import_module(module), cls)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return sorted(list(globals()) + list(_CODEC_EXPORTS))


__all__ = ["Codec", "CodecConfig", "__version__", *sorted(_CODEC_EXPORTS)]
