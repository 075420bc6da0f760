from audiocodecs_tpu.quant import fsq, rvq, vq  # noqa: F401
