"""HILCodec, TPU-native.

Replaces the reference's wrapper around the HILCodec vendor package
(reference ``audiocodecs/hilcodec.py:30-150``: ``hilcodec_{speech,music}``
checkpoints, quantizer invoked with ``n = num_codebooks`` at ``:76``).
Variance-constrained SEANet-style streaming codec @ 24 kHz, 8×1024
codebooks, emb dim 128.
"""

from __future__ import annotations

from audiocodecs_tpu.models.seanet_rvq import SEANetRVQCodec, SEANetRVQConfig

__all__ = ["HILCodec"]


class HILCodec(SEANetRVQCodec):
    DEFAULT_ORIG_SR = 24000

    @classmethod
    def default_model_config(cls, orig_sample_rate: int | None = None):
        return SEANetRVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            num_filters=32,
            hidden_size=128,
            upsampling_ratios=(8, 5, 4, 2),
            codebook_size=1024,
            codebook_dim=128,
            num_quantizers=8,
            use_causal_conv=True,
            pad_mode="constant",
            num_lstm_layers=0,
        )
