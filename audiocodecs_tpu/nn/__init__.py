from audiocodecs_tpu.nn import (  # noqa: F401
    focalnet,
    layers,
    lstm,
    seanet,
    streaming,
    transformer,
    vocos,
    wavlm,
)
