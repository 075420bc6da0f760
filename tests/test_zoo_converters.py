"""Vendor-schema converter tests for the codec zoo (round-2 families).

No vendor packages or checkpoints exist in this environment (the reference
downloads them at runtime, e.g. ``speechtokenizer.py:52-60``), so each test
synthesizes the documented vendor state-dict schema with random values and
asserts:
  1. the converter consumes every non-buffer key (strict mode),
  2. the emitted pytree is structurally identical (same paths, same shapes)
     to the family's ``init_*_params`` output — drop-in usable,
  3. a forward pass runs with converted params,
  4. weight-norm folding matches torch's ``weight_norm`` semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.convert import zoo


def synth_state_dict(schema: dict, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    sd = {}
    for k, shape in schema.items():
        if k.endswith("weight_g"):
            sd[k] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif k.endswith("inited"):
            sd[k] = np.ones(shape, np.float32)
        else:
            sd[k] = rng.standard_normal(shape).astype(np.float32)
    return sd


def tree_spec(tree, path=""):
    """{path: shape} map over a params pytree (dicts + lists + arrays)."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(tree_spec(v, f"{path}/{k}"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(tree_spec(v, f"{path}/{i}"))
    else:
        out[path] = tuple(np.shape(tree))
    return out


def assert_same_structure(converted, initialized, what):
    got, want = tree_spec(converted), tree_spec(initialized)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"{what}: tree mismatch; missing={missing[:6]} extra={extra[:6]}")
    bad = [p for p in want if got[p] != want[p]]
    assert not bad, (
        f"{what}: shape mismatch at {bad[:4]}: "
        f"{[(got[p], want[p]) for p in bad[:4]]}")


@pytest.fixture
def st_cfg():
    from audiocodecs_tpu.models.speechtokenizer import (
        SpeechTokenizerModelConfig,
    )

    return SpeechTokenizerModelConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=16, codebook_dim=16,
        num_quantizers=4,
    )


def test_speechtokenizer_converter(st_cfg):
    from audiocodecs_tpu.models.speechtokenizer import (
        SpeechTokenizer,
        init_speechtokenizer_params,
    )

    schema = zoo.speechtokenizer_schema(st_cfg)
    # documented vendor surface: encodec-fork naming with BiLSTM reverse keys
    assert "encoder.model.0.conv.conv.weight_g" in schema
    assert any("_reverse" in k for k in schema), "encoder BiLSTM keys"
    assert not any("_reverse" in k and k.startswith("decoder") for k in schema)
    assert "quantizer.vq.layers.0._codebook.embed" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_speechtokenizer_state_dict(sd, st_cfg)
    init = init_speechtokenizer_params(jax.random.PRNGKey(0), st_cfg)
    assert_same_structure(params, init, "speechtokenizer")

    codec = SpeechTokenizer(800, 800, num_codebooks=2, model_config=st_cfg,
                            params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 160)))
    assert toks.shape[-1] == 2
    assert np.isfinite(np.asarray(codec.toks_to_sig(toks))).all()


def test_speechtokenizer_strict_unmapped(st_cfg):
    schema = zoo.speechtokenizer_schema(st_cfg)
    sd = synth_state_dict(schema)
    sd["transform.weight"] = np.zeros((4, 4), np.float32)  # drifted key
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_speechtokenizer_state_dict(sd, st_cfg)


def test_past_converter():
    from audiocodecs_tpu.models.past import PAST
    from audiocodecs_tpu.models.seanet_rvq import (
        SEANetRVQConfig,
        init_seanet_rvq_params,
    )

    cfg = SEANetRVQConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=16, codebook_dim=16,
        num_quantizers=4, use_causal_conv=True,
    )
    schema = zoo.past_schema(cfg)
    sd = synth_state_dict(schema)
    params = zoo.convert_past_state_dict(sd, cfg)
    init = init_seanet_rvq_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "past")

    codec = PAST(800, 800, num_codebooks=2, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 160)))
    rec = codec.toks_to_sig(toks)
    assert np.isfinite(np.asarray(rec)).all()


def test_wavtokenizer_converter():
    from audiocodecs_tpu.models.wavtokenizer import (
        WavTokenizer,
        WavTokenizerModelConfig,
        init_wavtokenizer_params,
    )

    cfg = WavTokenizerModelConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=16, codebook_dim=16,
        vocos_dim=8, vocos_intermediate_dim=16, vocos_layers=2,
        n_fft=16, hop_length=8,
    )
    schema = zoo.wavtokenizer_schema(cfg)
    assert "feature_extractor.encodec.encoder.model.0.conv.conv.weight_g" in schema
    assert "feature_extractor.encodec.quantizer.vq.layers.0._codebook.embed" in schema
    assert "backbone.convnext.0.dwconv.weight" in schema
    assert "head.out.weight" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_wavtokenizer_state_dict(sd, cfg)
    init = init_wavtokenizer_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "wavtokenizer")

    codec = WavTokenizer(800, 800, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 160)))
    assert np.isfinite(np.asarray(codec.toks_to_sig(toks))).all()


def test_vocos_converter_matches_our_head():
    """charactr/vocos-encodec head: AdaLayerNorm over 4 bandwidths."""
    from audiocodecs_tpu.nn.vocos import VocosConfig, init_vocos_params

    cfg = VocosConfig(input_channels=16, dim=8, intermediate_dim=16,
                      num_layers=2, n_fft=16, hop_length=8,
                      num_adanorm_embeddings=4)
    schema = zoo.vocos_schema(cfg)
    assert "backbone.norm.scale.weight" in schema  # AdaLayerNorm embeddings
    sd = synth_state_dict(schema)
    params = zoo.convert_vocos_state_dict(sd, cfg)
    init = init_vocos_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "vocos")

    from audiocodecs_tpu.nn.vocos import apply_vocos

    y = apply_vocos(params, jnp.zeros((1, 4, 16)), cfg, cond_id=1)
    assert np.isfinite(np.asarray(y)).all()


def test_bigcodec_converter(rng):
    from audiocodecs_tpu.models.bigcodec import (
        BigCodec,
        BigCodecModelConfig,
        init_bigcodec_params,
    )

    cfg = BigCodecModelConfig(ngf=4, up_ratios=(2, 5), dilations=(1, 3),
                              hidden_size=16, codebook_size=32,
                              codebook_dim=8, rnn_layers=1)
    schema = zoo.bigcodec_schema(cfg)
    assert "conv_blocks.0.weight_g" in schema["CodecEnc"]
    assert "rnn.weight_ih_l0" in schema["CodecEnc"]
    assert "quantizer.layers.0.codebook.weight" in schema["generator"]

    ckpt = {part: synth_state_dict(s) for part, s in schema.items()}
    params = zoo.convert_bigcodec_state_dict(ckpt, cfg)
    init = init_bigcodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "bigcodec")

    codec = BigCodec(16000, 16000, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 200)))
    assert toks.shape == (1, 20, 1)
    rec = codec.toks_to_sig(toks)
    assert rec.shape == (1, 200) and np.isfinite(np.asarray(rec)).all()

    # drifted key fails loudly
    ckpt["CodecEnc"]["extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_bigcodec_state_dict(ckpt, cfg)


def test_weight_norm_fold_matches_torch():
    torch = pytest.importorskip("torch")
    from audiocodecs_tpu.convert.torch_utils import fold_weight_norm_np

    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(3, 5, 7))
    w = fold_weight_norm_np(conv.weight_g.detach().numpy(),
                            conv.weight_v.detach().numpy())
    np.testing.assert_allclose(w, conv.weight.detach().numpy(),
                               atol=1e-6, rtol=1e-5)


def test_xcodec2_converter():
    from audiocodecs_tpu.models.xcodec2 import (
        XCodec2,
        XCodec2ModelConfig,
        init_xcodec2_params,
    )
    from audiocodecs_tpu.nn.w2vbert import W2VBertConfig

    # hop must stay 320: the semantic branch's mel grid is fixed at 50 Hz
    cfg = XCodec2ModelConfig(
        ngf=4, acoustic_dim=16, semantic_dim=16, fused_dim=32,
        w2vbert=W2VBertConfig(hidden_size=16, num_layers=2, num_heads=2,
                              intermediate_size=32, input_dim=160,
                              conv_kernel=5),
        semantic_layer=2, backbone_depth=2, backbone_heads=2,
    )
    schema = zoo.xcodec2_schema(cfg)
    # fused single state dict covering all vendor modules
    assert "CodecEnc.conv_blocks.0.weight_g" in schema
    assert "semantic_model.encoder.layers.0.self_attn.linear_q.weight" in schema
    assert "generator.quantizer.project_in.weight" in schema
    assert "generator.backbone.transformers.0.attn.to_qkv.weight" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_xcodec2_state_dict(sd, cfg)
    init = init_xcodec2_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "xcodec2")

    codec = XCodec2(16000, 16000, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 1600)))
    assert toks.shape == (1, 1600 // 320, 1)
    assert int(np.asarray(toks).max()) < cfg.vocab_size
    rec = codec.toks_to_sig(toks)
    assert rec.shape == (1, 1600) and np.isfinite(np.asarray(rec)).all()

    # drifted key fails loudly
    sd["generator.backbone.pos_net.0.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_xcodec2_state_dict(sd, cfg)


def test_stablecodec_converter():
    import dataclasses

    from audiocodecs_tpu.models.stablecodec import (
        StableCodec,
        init_stablecodec_params,
    )

    cfg = dataclasses.replace(
        StableCodec.default_model_config(bottleneck=(2, 15625)),
        patch=8, dim=16, depth_outer=2, depth_inner=1, num_heads=2,
    )
    schema = zoo.stablecodec_schema(cfg)
    assert "encoder.outer.layers.0.self_attn.to_q.weight" in schema
    assert "decoder.patch_unembed.weight" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_stablecodec_state_dict(sd, cfg)
    init = init_stablecodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "stablecodec")

    codec = StableCodec(16000, 16000, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 160)))
    assert toks.shape == (1, 10, 2)
    rec = codec.toks_to_sig(toks)
    assert rec.shape == (1, 160) and np.isfinite(np.asarray(rec)).all()

    sd["encoder.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_stablecodec_state_dict(sd, cfg)


def test_nanocodec_converter():
    from audiocodecs_tpu.models.nanocodec import (
        NanoCodec,
        NanoCodecModelConfig,
        init_nanocodec_params,
    )

    cfg = NanoCodecModelConfig(
        sampling_rate=800, base_channels=4, down_sample_rates=(4, 2),
        resblock_kernels=(3, 5), resblock_dilations=(1, 3),
        levels=(5, 5, 5), num_groups=4,
    )
    schema = zoo.nanocodec_schema(cfg)
    assert "audio_encoder.pre_conv.conv.weight_g" in schema
    assert ("audio_encoder.res_layers.0.res_blocks.1.res_blocks.0."
            "input_conv.conv.weight_v") in schema
    assert ("audio_decoder.up_sample_conv_layers.0.conv.weight_v") in schema
    assert ("audio_encoder.activations.0.activation.snake_act.alpha"
            ) in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_nanocodec_state_dict(sd, cfg)
    init = init_nanocodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "nanocodec")

    codec = NanoCodec(800, 800, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 160)))
    assert toks.shape == (1, 20, 4)
    rec = codec.toks_to_sig(toks)
    assert rec.shape == (1, 160) and np.isfinite(np.asarray(rec)).all()

    # FSQ buffers are tolerated, drifted weights are not
    sd["vector_quantizer.fsqs.0.num_levels"] = np.zeros(3, np.float32)
    zoo.convert_nanocodec_state_dict(sd, cfg)
    sd["audio_encoder.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_nanocodec_state_dict(sd, cfg)


def test_audiodec_converter():
    from audiocodecs_tpu.models.audiodec import (
        AudioDec,
        AudioDecModelConfig,
        init_audiodec_params,
    )

    cfg = AudioDecModelConfig(
        sampling_rate=1200, encode_channels=4, channel_ratios=(2, 4),
        strides=(3, 4), code_dim=8, codebook_size=32, num_quantizers=4,
    )
    schema = zoo.audiodec_schema(cfg)
    assert "encoder.conv.conv.weight" in schema
    assert "quantizer.codebook.layers.3.embed" in schema
    assert "decoder.conv_blocks.0.conv1.deconv.weight" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_audiodec_state_dict(sd, cfg)
    init = init_audiodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "audiodec")

    codec = AudioDec(1200, 1200, num_codebooks=2, model_config=cfg,
                     params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 120)))
    assert toks.shape == (1, 10, 2)
    rec = codec.toks_to_sig(toks)
    assert rec.shape == (1, 120) and np.isfinite(np.asarray(rec)).all()
    # converted codebooks are the vendor embeds verbatim (truncated to K=2)
    np.testing.assert_allclose(
        np.asarray(codec.embs())[1],
        sd["quantizer.codebook.layers.1.embed"], atol=0)

    sd["encoder.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_audiodec_state_dict(sd, cfg)


def test_focalcodec_converter():
    from audiocodecs_tpu.models.focalcodec import (
        FocalCodec,
        FocalCodecModelConfig,
        init_focalcodec_params,
    )
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    cfg = FocalCodecModelConfig(
        codebook_bits=6,
        wavlm=WavLMConfig(
            hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
            conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2),
            conv_stride=(5, 2, 2), conv_bias=True,
            num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
            num_buckets=32, max_distance=50,
            do_stable_layer_norm=True, feat_extract_norm="layer",
        ),
        wavlm_layer=2, compressor_blocks=2, vocos_dim=8,
        vocos_intermediate_dim=16, vocos_layers=2, n_fft=32, hop_length=8,
    )
    schema = zoo.focalcodec_schema(cfg)
    assert "encoder.encoder.layers.0.attention.gru_rel_pos_linear.weight" in schema
    assert "compressor.blocks.0.modulation.f.weight" in schema
    assert "decoder.backbone.convnext.0.dwconv.weight" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_focalcodec_state_dict(sd, cfg)
    init = init_focalcodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "focalcodec")

    codec = FocalCodec(16000, 16000, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 800)))
    assert toks.shape[-1] == 1
    rec = codec.toks_to_sig(toks)
    assert np.isfinite(np.asarray(rec)).all()

    # BSQ codebook buffers are tolerated; drifted weights are not
    sd["quantizer.codebook"] = np.zeros((64, 6), np.float32)
    zoo.convert_focalcodec_state_dict(sd, cfg)
    sd["compressor.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_focalcodec_state_dict(sd, cfg)


def test_magicodec_converter():
    from audiocodecs_tpu.models.magicodec import (
        MagiCodec,
        MagiCodecModelConfig,
        init_magicodec_params,
    )

    cfg = MagiCodecModelConfig(hop_length=8, dim=16, depth=2, num_heads=2,
                               codebook_size=64, codebook_dim=8)
    schema = zoo.magicodec_schema(cfg)
    assert "quantizer.codebook.weight" in schema
    assert "encoder.transformers.1.attn.to_qkv.weight" in schema

    sd = synth_state_dict(schema)
    params = zoo.convert_magicodec_state_dict(sd, cfg)
    init = init_magicodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "magicodec")

    codec = MagiCodec(16000, 16000, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 160)))
    assert toks.shape == (1, 20, 1)
    rec = codec.toks_to_sig(toks)
    assert rec.shape == (1, 160) and np.isfinite(np.asarray(rec)).all()
    np.testing.assert_allclose(
        np.asarray(codec.params["codebook"]),
        sd["quantizer.codebook.weight"], atol=0)

    sd["decoder.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_magicodec_state_dict(sd, cfg)


def test_bicodec_converter():
    from audiocodecs_tpu.models.bicodec import (
        BiCodec,
        BiCodecModelConfig,
        init_bicodec_params,
    )
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    w2v = WavLMConfig(
        hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
        conv_dim=(16, 16, 16), conv_kernel=(10, 3, 2), conv_stride=(5, 2, 2),
        conv_bias=True, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=True,
        feat_extract_norm="layer", gated_rel_pos=False,
    )
    cfg = BiCodecModelConfig(
        w2v=w2v, feat_layers=(1, 2),
        encoder_dim=8, encoder_intermediate_dim=16, encoder_layers=2,
        latent_dim=16, codebook_size=64, codebook_dim=8,
        num_mels=20, n_fft=64, win_length=40, hop_length=20,
        speaker_channels=16, speaker_dim=16, perceiver_dim=8,
        perceiver_depth=1, fsq_levels=(4, 4, 4),
        prenet_dim=8, prenet_intermediate_dim=16, prenet_layers=2,
        decoder_channels=16, decoder_rates=(4, 5), decoder_kernels=(8, 10),
    )
    schema = zoo.bicodec_schema(cfg)
    assert "quantizer.in_proj.weight_g" in schema
    assert ("speaker_encoder.speaker_encoder.layer2.se_res2block.1."
            "convs.0.weight") in schema
    assert "speaker_encoder.perceiver_sampler.latents" in schema
    assert "prenet.decoder.convnext.0.norm.scale.weight" in schema
    assert "decoder.model.1.block.1.weight_v" in schema

    sd = synth_state_dict(schema)
    # BN running stats must be positive variances
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
    with pytest.raises(ValueError, match="w2v"):  # separate-file tower
        zoo.convert_bicodec_state_dict(sd, cfg)
    params = zoo.convert_bicodec_state_dict(sd, cfg, allow_random_w2v=True)
    init = init_bicodec_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "bicodec")

    codec = BiCodec(16000, 16000, model_config=cfg, params=params)
    toks = codec.sig_to_toks(jnp.zeros((1, 400)))
    assert toks.shape[-1] == 1 and toks.shape[1] > 32
    rec = codec.toks_to_sig(toks)
    assert np.isfinite(np.asarray(rec)).all()

    sd["speaker_encoder.extra.weight"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        zoo.convert_bicodec_state_dict(sd, cfg, allow_random_w2v=True)


def test_wavlm_kmeans_hifigan_vocoder_variant(rng):
    """The 'hifigan' vocoder variant decodes, and the converter accepts
    speechbrain's `.conv`-nested unit-vocoder naming."""
    import jax.numpy as jnp

    from audiocodecs_tpu.convert.ldm import hifigan_schema
    from audiocodecs_tpu.models.wavlm_kmeans import (
        WavLMKmeans,
        WavLMKmeansModelConfig,
        init_wavlm_kmeans_params,
    )
    from audiocodecs_tpu.nn.hifigan import HiFiGANConfig
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    tiny_hifi = HiFiGANConfig(
        num_mels=24, upsample_rates=(10, 8, 2, 2),
        upsample_kernel_sizes=(20, 16, 4, 4), upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),))
    mc = WavLMKmeansModelConfig(
        layer_ids=(1,), num_clusters=16,
        wavlm=WavLMConfig(hidden_size=24, num_layers=2, num_heads=2,
                          intermediate_size=48, conv_dim=(8,) * 7,
                          num_conv_pos_embedding_groups=4),
        vocoder_variant="hifigan")
    assert mc.hifigan().num_mels == 24  # reads wavlm.hidden_size

    codec = WavLMKmeans(16000, 16000, model_config=mc,
                        key=jax.random.PRNGKey(0))
    sig = jnp.asarray(rng.standard_normal((1, 3200)).astype(np.float32))
    toks = codec.sig_to_toks(sig)
    rec = codec.toks_to_sig(toks)
    assert rec.shape[0] == 1 and bool(jnp.isfinite(rec).all())
    # hop 320: one frame of tokens -> 320 samples
    assert rec.shape[1] == toks.shape[1] * 320

    # speechbrain-style nested keys convert to the same structure
    flat_schema = hifigan_schema(tiny_hifi)
    nested = {}
    for k, shape in flat_schema.items():
        for stem in ("weight_g", "weight_v", "weight", "bias"):
            if k.endswith("." + stem):
                nested[k[: -len(stem) - 1] + ".conv." + stem] = shape
                break
    sd = synth_state_dict(nested)
    params = zoo.convert_wavlm_kmeans_vocoder(sd, tiny_hifi)
    from audiocodecs_tpu.nn.hifigan import init_hifigan_params
    init = init_hifigan_params(jax.random.PRNGKey(1), tiny_hifi)
    assert_same_structure(params, init, "wavlm_kmeans_vocoder")


def _tiny_hilcodec_cfg():
    from audiocodecs_tpu.models.hilcodec import HILCodecModelConfig

    return HILCodecModelConfig(
        sampling_rate=800, channels=4, max_channels=16, strides=(4, 2),
        emb_dim=16, codebook_size=8, num_quantizers=2)


def test_hilcodec_partial_converter(rng):
    """Interface-certain piece: quantizer.layers.{k}.embed codebooks load;
    towers keep base params pending a real-checkpoint diff."""
    from audiocodecs_tpu.convert.zoo import convert_hilcodec_components
    from audiocodecs_tpu.models.hilcodec import (
        HILCodec,
        init_hilcodec_params,
    )

    mc = _tiny_hilcodec_cfg()
    base = init_hilcodec_params(jax.random.PRNGKey(0), mc)
    sd = {f"quantizer.layers.{k}.embed":
          rng.standard_normal((8, 16)).astype(np.float32)
          for k in range(2)}
    params = convert_hilcodec_components(mc, quantizer_sd=sd,
                                         base_params=base)
    np.testing.assert_allclose(np.asarray(params["codebooks"][1]),
                               sd["quantizer.layers.1.embed"])
    codec = HILCodec(800, 800, model_config=mc, num_codebooks=2,
                     params=params)
    sig = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32))
    rec = codec.toks_to_sig(codec.sig_to_toks(sig))
    assert bool(jnp.isfinite(rec).all())

    with pytest.raises(ValueError, match="shape"):
        convert_hilcodec_components(
            mc, quantizer_sd={f"quantizer.layers.{k}.embed":
                              np.zeros((8, 4), np.float32)
                              for k in range(2)}, base_params=base)


def test_hilcodec_full_converter(rng):
    """Full documented tower schema: synthesized vendor state dict →
    structurally identical params; unmapped keys fail loudly; CLI adapter
    falls back to codebooks-only on schema drift."""
    import warnings

    from audiocodecs_tpu.convert.zoo import (
        convert_hilcodec_full_state_dict,
        convert_hilcodec_state_dict,
        hilcodec_schema,
    )
    from audiocodecs_tpu.models.hilcodec import (
        HILCodec,
        init_hilcodec_params,
    )

    mc = _tiny_hilcodec_cfg()
    sd = synth_state_dict(hilcodec_schema(mc))
    params = convert_hilcodec_full_state_dict(sd, mc)
    init = init_hilcodec_params(jax.random.PRNGKey(0), mc)
    assert_same_structure(params, init, "hilcodec")
    codec = HILCodec(800, 800, model_config=mc, num_codebooks=2,
                     params=params)
    sig = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32))
    rec = codec.toks_to_sig(codec.sig_to_toks(sig))
    assert rec.shape == (1, 800) and bool(jnp.isfinite(rec).all())

    bad = dict(sd)
    bad["encoder.mystery.weight"] = np.zeros((4, 4, 3), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_hilcodec_full_state_dict(bad, mc)

    # CLI adapter: full schema converts cleanly...
    full = convert_hilcodec_state_dict(sd, mc)
    assert_same_structure(full, init, "hilcodec-cli")
    # ...a towers-renamed checkpoint RAISES by default (no silent random
    # towers from a "successful" CLI run)...
    quant_only = {k: v for k, v in sd.items()
                  if k.startswith("quantizer.")}
    with pytest.raises(ValueError, match="ACX_ALLOW_PARTIAL_CONVERT"):
        convert_hilcodec_state_dict(quant_only, mc)
    # ...and degrades to codebooks-only with a loud warning only when the
    # partial conversion is explicitly opted into
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        partial = convert_hilcodec_state_dict(quant_only, mc,
                                              allow_partial=True)
    assert any("tower conversion failed" in str(x.message) for x in w)
    np.testing.assert_allclose(
        np.asarray(partial["codebooks"][0]),
        sd["quantizer.layers.0.embed"])


def test_dycast_converter(rng):
    """Documented-guess schema (vendor schema unreleased — reference
    torch.hub loads it, dycast.py:85-90): synthesized state dict converts
    to a structurally-identical param tree; strict on unmapped keys."""
    from audiocodecs_tpu.convert.zoo import (
        convert_dycast_state_dict,
        dycast_schema,
    )
    from audiocodecs_tpu.models.dycast import (
        DyCAST,
        DyCASTModelConfig,
        init_dycast_params,
    )
    from audiocodecs_tpu.nn.wavlm import WavLMConfig

    mc = DyCASTModelConfig(
        num_channels=4, max_segments=16, max_duration=8,
        wavlm=WavLMConfig(hidden_size=16, num_layers=2, num_heads=2,
                          intermediate_size=32,
                          conv_dim=(8, 8), conv_kernel=(10, 4),
                          conv_stride=(5, 2)),
        wavlm_layer=1, vocoder_filters=4, vocoder_ratios=(5, 2),
        use_retriever=True, retriever_bank_size=8)
    sd = synth_state_dict(dycast_schema(mc))
    sd["codebook"] = np.zeros((16, 8), np.float32)  # tolerated buffer
    params = convert_dycast_state_dict(sd, mc)
    init = init_dycast_params(jax.random.PRNGKey(0), mc)
    assert_same_structure(params, init, "dycast")

    codec = DyCAST(16000, 16000, model_config=mc, params=params)
    sig = jnp.asarray(rng.standard_normal((1, 800)).astype(np.float32))
    toks = codec.sig_to_toks(sig)
    assert toks.shape[-1] == mc.num_channels + 1
    assert bool(jnp.isfinite(codec.toks_to_sig(toks)).all())

    bad = dict(sd)
    bad["duration_predictor.head.weight"] = np.zeros((1, 16), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_dycast_state_dict(bad, mc)
