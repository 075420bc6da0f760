from audiocodecs_tpu.nn import layers, lstm, seanet  # noqa: F401
