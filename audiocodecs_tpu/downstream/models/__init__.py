from audiocodecs_tpu.downstream.models import (  # noqa: F401
    llama,
    multihead,
    pooling,
    speaker_encoder,
)
