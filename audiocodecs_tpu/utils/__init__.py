from audiocodecs_tpu.utils import audio, masking  # noqa: F401
