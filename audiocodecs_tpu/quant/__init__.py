from audiocodecs_tpu.quant import fsq, rvq, vq  # noqa: F401
from audiocodecs_tpu.quant import certify  # noqa: F401
