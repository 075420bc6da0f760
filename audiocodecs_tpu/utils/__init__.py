from audiocodecs_tpu.utils import audio, checkpoint, masking  # noqa: F401
