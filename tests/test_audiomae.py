"""AudioMAE ViT + kaldi fbank front-end (SemantiCodec's real encoder path).

The ViT forward is parity-checked against an independent torch
implementation built from the same (timm-naming) state dict — the actual
layout the released AudioMAE checkpoints use. The kaldi fbank has no oracle
in this image (torchaudio is not installed; the reference wraps it), so it
gets spec-derived property tests.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.convert.audiomae import (
    audiomae_schema,
    convert_audiomae_state_dict,
)
from audiocodecs_tpu.nn.audiomae import (
    AudioMAEConfig,
    apply_audiomae,
    init_audiomae_params,
)

TINY = AudioMAEConfig(mel_frames=32, mel_bins=16, patch_size=4,
                      hidden_size=16, num_layers=2, num_heads=2)


def _synth_sd(schema, seed=0):
    rng = np.random.default_rng(seed)
    return {k: (rng.standard_normal(s) * 0.2).astype(np.float32)
            for k, s in schema.items()}


def _torch_vit(sd, cfg, mel):
    """Independent oracle: the timm-style ViT in torch semantics."""
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v.copy()) for k, v in sd.items()}
    x = torch.from_numpy(mel)[:, None]  # [B, 1, H, W]
    x = F.conv2d(x, t["patch_embed.proj.weight"],
                 t["patch_embed.proj.bias"], stride=cfg.patch_size)
    B, D = x.shape[0], x.shape[1]
    x = x.flatten(2).transpose(1, 2)  # [B, P, D]
    cls = t["cls_token"].expand(B, -1, -1)
    x = torch.cat([cls, x], dim=1) + t["pos_embed"]

    def ln(v, p):
        return F.layer_norm(v, (D,), t[f"{p}.weight"], t[f"{p}.bias"],
                            eps=1e-6)

    heads = cfg.num_heads
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        h = ln(x, f"{b}.norm1")
        qkv = F.linear(h, t[f"{b}.attn.qkv.weight"], t[f"{b}.attn.qkv.bias"])
        q, k, v = qkv.chunk(3, dim=-1)
        hd = D // heads

        def split(u):
            return u.reshape(B, -1, heads, hd).transpose(1, 2)

        a = F.scaled_dot_product_attention(split(q), split(k), split(v))
        a = a.transpose(1, 2).reshape(B, -1, D)
        x = x + F.linear(a, t[f"{b}.attn.proj.weight"],
                         t[f"{b}.attn.proj.bias"])
        h = ln(x, f"{b}.norm2")
        h = F.linear(h, t[f"{b}.mlp.fc1.weight"], t[f"{b}.mlp.fc1.bias"])
        h = F.gelu(h)
        h = F.linear(h, t[f"{b}.mlp.fc2.weight"], t[f"{b}.mlp.fc2.bias"])
        x = x + h
    return ln(x, "norm").numpy()


def test_vit_parity_vs_torch(rng):
    pytest.importorskip("torch")
    import torch

    sd = _synth_sd(audiomae_schema(TINY))
    params = convert_audiomae_state_dict(sd, TINY)
    mel = rng.standard_normal((2, 32, 16)).astype(np.float32)
    with torch.no_grad():
        want = _torch_vit(sd, TINY, mel)
    got = np.asarray(apply_audiomae(params, jnp.asarray(mel), TINY,
                                    keep_cls=True))
    assert got.shape == want.shape == (2, 1 + TINY.num_patches, 16)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_converted_tree_matches_init():
    from tests.test_zoo_converters import assert_same_structure

    sd = _synth_sd(audiomae_schema(TINY))
    params = convert_audiomae_state_dict(sd, TINY)
    init = init_audiomae_params(jax.random.PRNGKey(0), TINY)
    assert_same_structure(params, init, "audiomae")


def test_vitb_default_schema():
    cfg = AudioMAEConfig()  # ViT-B over 1024×128 mel
    assert cfg.num_patches == 512
    schema = audiomae_schema(cfg)
    assert schema["pos_embed"] == (1, 513, 768)
    assert schema["blocks.11.attn.qkv.weight"] == (2304, 768)


def test_kaldi_fbank_properties(rng):
    from audiocodecs_tpu.nn.kaldi_fbank import (
        AUDIOMAE_NORM_MEAN,
        audiomae_normalize,
        kaldi_fbank,
    )

    x = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    fb = np.asarray(kaldi_fbank(x[None], 16000))
    # snip-edges frame count: 1 + (16000 − 400) // 160 = 98
    assert fb.shape == (1, 98, 128)
    assert np.isfinite(fb).all()
    # log scale: silence → log(eps) floor
    silent = np.asarray(kaldi_fbank(np.zeros((1, 4000), np.float32), 16000))
    assert silent.max() < -10.0
    # louder signal → uniformly larger log energies
    loud = np.asarray(kaldi_fbank(x[None] * 10.0, 16000))
    assert loud.mean() > fb.mean()
    # tone concentrates energy near its mel band
    t = np.arange(16000) / 16000
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    tb = np.asarray(kaldi_fbank(tone[None], 16000))[0].mean(axis=0)
    assert 20 < tb.argmax() < 80
    norm = np.asarray(audiomae_normalize(jnp.asarray(fb)))
    assert abs(norm.mean() - (fb.mean() - AUDIOMAE_NORM_MEAN) / 9.1379948
               ) < 1e-4


def test_kaldi_fbank_jit(rng):
    from audiocodecs_tpu.nn.kaldi_fbank import kaldi_fbank

    f = jax.jit(lambda s: kaldi_fbank(s, 16000, num_mel_bins=16))
    x = jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32))
    out = f(x)
    assert out.shape == (2, 1 + (4000 - 400) // 160, 16)


def test_semanticodec_component_converter(rng):
    from audiocodecs_tpu.convert.zoo import convert_semanticodec_components
    from audiocodecs_tpu.models.semanticodec import (
        SemantiCodec,
        SemantiCodecModelConfig,
    )

    mc = SemantiCodecModelConfig(
        mel_bins=16, window_frames=32, patch_size=4, vit_hidden=16,
        vit_layers=2, vit_heads=2, stack_factor=2, semantic_vocab=32,
        acoustic_vocab=16, denoiser_hidden=16, denoiser_layers=1,
        denoiser_heads=2, ddim_steps=2, decoder_variant="analog",
    )
    sd = _synth_sd(audiomae_schema(mc.audiomae()))
    cents = rng.standard_normal((32, mc.feature_dim)).astype(np.float32)
    params = convert_semanticodec_components(mc, audiomae_sd=sd,
                                             centroids=cents)
    codec = SemantiCodec(16000, 16000, model_config=mc, params=params)
    toks = codec.sig_to_toks(jnp.asarray(
        rng.standard_normal((1, 8000)).astype(np.float32)))
    assert toks.shape[-1] == 2
    np.testing.assert_allclose(np.asarray(codec.params["semantic_codebook"]),
                               cents)
    with pytest.raises(ValueError, match="centroid_npy"):
        convert_semanticodec_components(mc, centroids=cents[:, :4])