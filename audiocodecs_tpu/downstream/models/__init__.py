from audiocodecs_tpu.downstream.models import llama, multihead, pooling  # noqa: F401
