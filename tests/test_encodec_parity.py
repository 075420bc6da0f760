"""Golden parity: JAX EnCodec vs the PyTorch HF implementation.

Strategy (offline-safe): build a small random-weight ``transformers``
``EncodecModel`` (the same backbone the reference wraps, reference
``audiocodecs/encodec.py:51``), randomize its codebooks, convert the state
dict, and require exact token match + close waveform reconstruction.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from audiocodecs_tpu.convert.encodec import (
    convert_encodec_state_dict,
    encodec_config_from_hf,
)
from audiocodecs_tpu.models.encodec import Encodec
from audiocodecs_tpu.nn.seanet import apply_encoder, apply_decoder
from audiocodecs_tpu.quant.rvq import rvq_decode, rvq_encode

pytestmark = pytest.mark.quick


def make_hf_model(causal=True, pad_mode="reflect", seed=0, ratios=(4, 2),
                  num_filters=4, hidden=16, codebook_size=32):
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(seed)
    # num_quantizers is a derived property:
    # 1000·max_bw // (frame_rate·log2(codebook_size)). With sr=800, hop=8,
    # codebook 32 → frame_rate 100, nbits 5 → max_bw 2.0 gives 4 quantizers.
    cfg = EncodecConfig(
        target_bandwidths=[0.5, 2.0],
        sampling_rate=800,
        audio_channels=1,
        normalize=False,
        chunk_length_s=None,
        overlap=None,
        hidden_size=hidden,
        num_filters=num_filters,
        num_residual_layers=1,
        upsampling_ratios=list(ratios),
        kernel_size=7,
        last_kernel_size=7,
        residual_kernel_size=3,
        dilation_growth_rate=2,
        use_causal_conv=causal,
        pad_mode=pad_mode,
        compress=2,
        num_lstm_layers=2,
        trim_right_ratio=1.0,
        codebook_size=codebook_size,
        codebook_dim=hidden,
    )
    assert cfg.num_quantizers == 4
    model = EncodecModel(cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()
    return model, cfg


def torch_encode_tokens(model, x, K):
    """Reference token path: encoder → first-K RVQ stages → [B, N, K]."""
    with torch.no_grad():
        emb = model.encoder(x[:, None, :])  # [B, H, N]
        residual = emb
        codes = []
        for layer in model.quantizer.layers[:K]:
            idx = layer.encode(residual)
            codes.append(idx)
            residual = residual - layer.decode(idx)
        return torch.stack(codes, dim=-1)  # [B, N, K]


@pytest.mark.parametrize("causal,pad_mode", [(True, "reflect"), (False, "reflect"),
                                             (True, "constant")])
def test_encoder_token_parity(rng, causal, pad_mode):
    model, hf_cfg = make_hf_model(causal=causal, pad_mode=pad_mode)
    cfg = encodec_config_from_hf(hf_cfg)
    params = convert_encodec_state_dict(model.state_dict(), cfg)

    x = rng.standard_normal((2, 201)).astype(np.float32)  # odd length on purpose
    K = 3
    want = torch_encode_tokens(model, torch.from_numpy(x), K).numpy()

    feats = apply_encoder(params["encoder"], jnp.asarray(x)[:, :, None], cfg.seanet())
    got = np.asarray(rvq_encode(feats, jnp.asarray(params["codebooks"]), K))
    assert got.shape == want.shape
    match = (got == want).mean()
    assert match == 1.0, f"token match {match:.4f}"


def test_encoder_feature_parity(rng):
    model, hf_cfg = make_hf_model()
    cfg = encodec_config_from_hf(hf_cfg)
    params = convert_encodec_state_dict(model.state_dict(), cfg)
    x = rng.standard_normal((2, 160)).astype(np.float32)
    with torch.no_grad():
        want = model.encoder(torch.from_numpy(x)[:, None, :]).numpy()  # [B,H,N]
    got = np.asarray(
        apply_encoder(params["encoder"], jnp.asarray(x)[:, :, None], cfg.seanet())
    )  # [B,N,H]
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=2e-5, rtol=1e-4)


def test_decoder_waveform_parity(rng):
    model, hf_cfg = make_hf_model()
    cfg = encodec_config_from_hf(hf_cfg)
    params = convert_encodec_state_dict(model.state_dict(), cfg)
    K = 4
    toks = rng.integers(0, hf_cfg.codebook_size, size=(2, 25, K)).astype(np.int32)
    with torch.no_grad():
        q = model.quantizer.decode(torch.from_numpy(toks).long().movedim(-1, 0))
        want = model.decoder(q).numpy()[:, 0]  # [B, T]
    qj = rvq_decode(jnp.asarray(toks), jnp.asarray(params["codebooks"]))
    got = np.asarray(apply_decoder(params["decoder"], qj, cfg.seanet()))[:, :, 0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_full_roundtrip_through_codec_api(rng):
    """End-to-end through the public Codec class incl. resampling."""
    model, hf_cfg = make_hf_model()
    cfg = encodec_config_from_hf(hf_cfg)
    params = convert_encodec_state_dict(model.state_dict(), cfg)
    codec = Encodec(
        sample_rate=16000,
        orig_sample_rate=24000,
        num_codebooks=2,
        model_config=cfg,
        params=params,
    )
    sig = rng.standard_normal((2, 400)).astype(np.float32)
    toks = codec.sig_to_toks(jnp.asarray(sig))
    assert toks.shape[0] == 2 and toks.shape[2] == 2
    rec = codec.toks_to_sig(toks)
    assert rec.shape[0] == 2
    emb = codec.embs()
    assert emb.shape == (2, hf_cfg.codebook_size, hf_cfg.hidden_size)
    # qfeats consistency: toks -> qfeats == decode of toks
    qf = codec.toks_to_qfeats(toks)
    assert qf.shape == (2, toks.shape[1], hf_cfg.hidden_size)


def test_normalized_token_parity(rng):
    """48 kHz-style loudness-normalized encode (single chunk)."""
    model, hf_cfg = make_hf_model()
    hf_cfg.normalize = True
    from transformers import EncodecModel

    torch.manual_seed(1)
    model = EncodecModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()
    cfg = encodec_config_from_hf(hf_cfg)
    assert cfg.normalize
    params = convert_encodec_state_dict(model.state_dict(), cfg)
    codec = Encodec(800, 800, num_codebooks=4, model_config=cfg, params=params)

    x = rng.standard_normal((2, 160)).astype(np.float32) * 3.0
    with torch.no_grad():
        out = model.encode(torch.from_numpy(x)[:, None, :], bandwidth=2.0)
        want = out.audio_codes[0].numpy().transpose(0, 2, 1)  # [B, N, K]
    got = np.asarray(codec.sig_to_toks(jnp.asarray(x)))
    assert got.shape == want.shape
    assert (got == want).mean() == 1.0


def test_mode_pruning():
    model, hf_cfg = make_hf_model()
    cfg = encodec_config_from_hf(hf_cfg)
    params = convert_encodec_state_dict(model.state_dict(), cfg)
    enc = Encodec(24000, 24000, mode="encode", model_config=cfg, params=dict(params))
    assert "decoder" not in enc.params and "encoder" in enc.params
    dec = Encodec(24000, 24000, mode="decode", model_config=cfg, params=dict(params))
    assert "encoder" not in dec.params and "decoder" in dec.params


def test_chunked_token_parity(rng):
    """48 kHz-style windowed chunking: exact token parity with HF's chunked
    encode on every full chunk. overlap=0 → all chunks full → exact
    everywhere; overlap=0.25 → HF's trailing sliver chunk differs by design
    (we zero-pad to the full window, modeling_encodec.py pads tokens), so
    parity is asserted on chunks 0..n-2."""
    model, hf_cfg = make_hf_model()
    hf_cfg.normalize = True
    hf_cfg.chunk_length_s = 0.4  # 320 samples at sr=800, hop 8 → 40 frames
    from transformers import EncodecModel

    torch.manual_seed(2)
    model = EncodecModel(hf_cfg).eval()
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_()

    for overlap, T, full_chunks in [(0.0, 960, 3), (0.25, 800, 3)]:
        hf_cfg.overlap = overlap
        cfg = encodec_config_from_hf(hf_cfg)
        assert cfg.chunk_length == 320
        assert cfg.chunk_stride == int(320 * (1 - overlap))
        params = convert_encodec_state_dict(model.state_dict(), cfg)
        codec = Encodec(800, 800, num_codebooks=4, model_config=cfg,
                        params=params)
        x = rng.standard_normal((2, T)).astype(np.float32) * 2.0
        with torch.no_grad():
            out = model.encode(torch.from_numpy(x)[:, None, :], bandwidth=2.0)
            # [n, B, K, Nc] → [B, n·Nc, K]
            want = (out.audio_codes.numpy().transpose(1, 0, 3, 2)
                    .reshape(2, -1, 4))
        got = np.asarray(codec.sig_to_toks(jnp.asarray(x)))
        n_frames = full_chunks * 40
        assert got.shape[1] >= n_frames and want.shape[1] >= n_frames
        assert (got[:, :n_frames] == want[:, :n_frames]).mean() == 1.0, overlap

        # decode parity on the overlap=0 case (no sliver chunks): HF
        # overlap-adds the same triangle weights → identical waveform.
        if overlap == 0.0:
            assert got.shape == want.shape
            with torch.no_grad():
                dec = model.decode(out.audio_codes,
                                   [None] * out.audio_codes.shape[0])
            want_sig = dec.audio_values[:, 0].numpy()
            got_sig = np.asarray(codec.toks_to_sig(jnp.asarray(got)))
            assert got_sig.shape == want_sig.shape
            scale = np.abs(want_sig).max()
            np.testing.assert_allclose(got_sig, want_sig,
                                       atol=1e-5 * scale, rtol=1e-4)
        else:
            # overlap>0 roundtrip: static shapes, finite output, correct
            # overlap-add length stride·(n−1)+L
            sig = np.asarray(codec.toks_to_sig(jnp.asarray(got)))
            n = got.shape[1] // 40
            assert sig.shape == (2, cfg.chunk_stride * (n - 1) + 320)
            assert np.isfinite(sig).all()


def test_linear_overlap_add_partition_of_unity():
    """Overlap-add invariant: after weight normalization, a constant chunk
    grid reconstructs the constant exactly for ANY stride (the triangle
    weights cancel), and single-coverage regions are a no-op."""
    from audiocodecs_tpu.models.encodec import _linear_overlap_add

    for stride in (320, 240, 100):
        chunks = jnp.ones((2, 3, 320)) * 0.7
        out = np.asarray(_linear_overlap_add(chunks, stride))
        assert out.shape == (2, stride * 2 + 320)
        np.testing.assert_allclose(out, 0.7, rtol=1e-6)
    # two-chunk crossfade is linear: ramp weights sum to the blend identity
    a = jnp.concatenate([jnp.zeros((1, 1, 8)), jnp.ones((1, 1, 8))], axis=1)
    out = np.asarray(_linear_overlap_add(a, 4))[0]
    assert out[0] == 0.0 and out[-1] == 1.0
    assert np.all(np.diff(out[3:9]) >= 0)  # monotone blend in the overlap
