"""AudioDec (symmetric autoencoder, symAD), TPU-native.

Replaces the reference's wrapper around the AudioDec vendor package
(reference ``audiocodecs/audiodec.py:30-159``: the
``symAD_libritts_24000_hop300`` generator — encoder → projector → RVQ
``quantizer.inference`` at ``:76-84``, RVQ layers truncated in place to K at
``:58-60``). 24 kHz, hop 300, 8×1024 codebooks of dim 64 behind a projector.
"""

from __future__ import annotations

from audiocodecs_tpu.models.seanet_rvq import SEANetRVQCodec, SEANetRVQConfig

__all__ = ["AudioDec"]


class AudioDec(SEANetRVQCodec):
    DEFAULT_ORIG_SR = 24000

    @classmethod
    def default_model_config(cls, orig_sample_rate: int | None = None):
        # hop 300 = 5·5·4·3 → 80 Hz; projector to 64-d codebooks.
        return SEANetRVQConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR,
            num_filters=32,
            hidden_size=128,
            upsampling_ratios=(5, 5, 4, 3),
            codebook_size=1024,
            codebook_dim=64,
            num_quantizers=8,
            use_causal_conv=True,
            pad_mode="constant",
        )
