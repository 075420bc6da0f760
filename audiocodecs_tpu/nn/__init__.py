from audiocodecs_tpu.nn import (  # noqa: F401
    conformer,
    focalnet,
    layers,
    lstm,
    seanet,
    streaming,
    transformer,
    vocos,
    wavlm,
)
