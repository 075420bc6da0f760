from audiocodecs_tpu.utils import audio, checkpoint, masking, windowed  # noqa: F401
