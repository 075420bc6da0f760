from audiocodecs_tpu.parallel import mesh  # noqa: F401
