"""RoFormer codecs honor the decoder-role precision knobs.

Round-4 fix: ``nn/roformer.py`` hardcoded HIGHEST on every matmul, so
``ACX_DEC_CONV_PRECISION`` / serving presets never reached the decode
side of MagiCodec / StableCodec / XCodec2. Now the blocks read the
role-aware ``conv_precision()`` and each codec's ``_decode`` runs inside
``conv_role("decoder")``. CPU cannot observe the multipass numerics
(HIGHEST == DEFAULT in f32 on CPU), so these tests pin the PLUMBING:
the decoder role is active for every matmul traced inside decode, and
tokens are invariant to the decoder knob (encode never sees it).
"""

import dataclasses

import numpy as np
import pytest

import jax

from audiocodecs_tpu.nn import layers


def _tiny(fam):
    from audiocodecs_tpu.models import get_codec_class

    cls = get_codec_class(fam)
    if fam == "xcodec2":
        from audiocodecs_tpu.models.xcodec2 import XCodec2ModelConfig
        from audiocodecs_tpu.nn.w2vbert import W2VBertConfig

        mc = XCodec2ModelConfig(
            ngf=4, acoustic_dim=16, semantic_dim=16, fused_dim=32,
            w2vbert=W2VBertConfig(hidden_size=16, num_layers=2,
                                  num_heads=2, intermediate_size=32,
                                  conv_kernel=5),
            semantic_layer=2, backbone_depth=2, backbone_heads=2,
        )
    else:
        mc = cls.default_model_config(16000)
        small = {}
        for f, v in (("dim", 64), ("depth", 1), ("num_heads", 2),
                     ("codebook_size", 64)):
            if hasattr(mc, f):
                small[f] = v
        mc = dataclasses.replace(mc, **small)
    return cls(sample_rate=16000, mode="reconstruct", model_config=mc,
               key=jax.random.PRNGKey(0))


@pytest.mark.parametrize("fam", ["magicodec", "stablecodec", "xcodec2"])
def test_decode_runs_in_decoder_role(fam, monkeypatch):
    if fam == "xcodec2":
        pytest.importorskip("transformers")
    codec = _tiny(fam)
    sig = jax.numpy.asarray(
        np.random.default_rng(0).standard_normal((1, 3200)) * 0.1,
        jax.numpy.float32)
    toks = np.asarray(jax.jit(codec._sig_to_toks)(codec.params, sig, None))

    roles_seen = []
    real = layers.conv_precision

    def spy():
        roles_seen.append(layers._CONV_ROLE)
        return real()

    monkeypatch.setattr(layers, "conv_precision", spy)
    # retrace (fresh jit) so the spy observes trace-time role reads
    jax.jit(codec._toks_to_sig)(codec.params, jax.numpy.asarray(toks), None)
    assert roles_seen, "decode traced no precision reads"
    assert all(r == "decoder" for r in roles_seen), roles_seen


@pytest.mark.parametrize("fam", ["magicodec", "stablecodec"])
def test_tokens_invariant_to_decoder_knob(fam, monkeypatch):
    sig = jax.numpy.asarray(
        np.random.default_rng(1).standard_normal((1, 3200)) * 0.1,
        jax.numpy.float32)
    out = {}
    for knob in ("", "default"):
        monkeypatch.setenv("ACX_DEC_CONV_PRECISION", knob)
        codec = _tiny(fam)
        out[knob] = np.asarray(
            jax.jit(codec._sig_to_toks)(codec.params, sig, None))
    np.testing.assert_array_equal(out[""], out["default"])
