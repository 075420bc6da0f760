from audiocodecs_tpu.downstream.metrics import codebook_util, dsp, stoi  # noqa: F401
from audiocodecs_tpu.downstream.metrics.base import MetricStats  # noqa: F401
