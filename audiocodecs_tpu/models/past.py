"""PAST — Phonetic-Acoustic Speech Tokenizer, TPU-native.

Inference architecture is EnCodec-style SEANet + RVQ at 16 kHz (the phonetic
supervision is a training-time auxiliary). Replaces the reference's wrapper
around the PAST vendor package (reference ``audiocodecs/past.py:30-150``,
which sets ``quantizer.n_q = K`` and notes the EnCodec-style RVQ at
``:66-108``). The ``streamable`` variant uses causal convs.
"""

from __future__ import annotations

from audiocodecs_tpu.models.seanet_rvq import SEANetRVQCodec, SEANetRVQConfig

__all__ = ["PAST"]


class PAST(SEANetRVQCodec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: int | None = None,
                             streamable: bool = True):
        # 16 kHz, hop 320 → 50 Hz; EnCodec dims (C=1024, emb 128).
        return SEANetRVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            num_filters=32,
            hidden_size=128,
            upsampling_ratios=(8, 5, 4, 2),
            codebook_size=1024,
            codebook_dim=128,
            num_quantizers=8,
            use_causal_conv=streamable,
        )
