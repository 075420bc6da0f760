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

__all__ = ["Codec", "CodecConfig", "__version__"]
