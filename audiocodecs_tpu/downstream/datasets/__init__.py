from audiocodecs_tpu.downstream.datasets import loader, manifest, synthetic  # noqa: F401
