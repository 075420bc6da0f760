from audiocodecs_tpu.convert import torch_utils  # noqa: F401
