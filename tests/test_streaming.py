"""Streaming (chunked-causal) parity: chunked execution == batch execution.

The causal design guarantee: for zero-padded causal stacks, encoding chunk by
chunk with carried state produces exactly the same tokens/waveform as one
batch call (the property behind BASELINE config #4, Mimi streaming).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.models.mimi import Mimi, MimiModelConfig

CFG = MimiModelConfig(
    sampling_rate=512,
    num_filters=8,
    hidden_size=32,
    upsampling_ratios=(4, 2),
    kernel_size=7,
    last_kernel_size=3,
    num_hidden_layers=2,
    num_attention_heads=2,
    num_key_value_heads=2,
    head_dim=16,
    intermediate_size=64,
    sliding_window=6,
    codebook_size=32,
    codebook_dim=16,
    num_quantizers=4,
    num_semantic_quantizers=1,
    frame_rate=32.0,
    encodec_frame_rate=64.0,
    upsample_groups=32,
)


@pytest.fixture(scope="module")
def codec():
    return Mimi(512, 512, num_codebooks=4, model_config=CFG,
                key=jax.random.PRNGKey(3))


def test_streaming_encode_matches_batch(rng, codec):
    frame = codec.frame_size  # 4*2*2 = 16 samples
    n_frames = 12
    sig = rng.standard_normal((2, frame * n_frames)).astype(np.float32)

    batch_toks = np.asarray(codec.sig_to_toks(jnp.asarray(sig)))

    state = codec.init_streaming_state(batch=2)
    outs = []
    for f in range(0, n_frames, 2):  # chunks of 2 frames
        chunk = jnp.asarray(sig[:, f * frame : (f + 2) * frame])
        toks, state = codec.encode_chunk(chunk, state)
        outs.append(np.asarray(toks))
    stream_toks = np.concatenate(outs, axis=1)

    assert stream_toks.shape == batch_toks.shape
    match = (stream_toks == batch_toks).mean()
    assert match == 1.0, f"streaming/batch token match {match:.4f}"


def test_streaming_decode_matches_batch(rng, codec):
    n_frames = 10
    toks = rng.integers(0, CFG.codebook_size, (2, n_frames, 4)).astype(np.int32)

    batch_sig = np.asarray(codec.toks_to_sig(jnp.asarray(toks)))

    state = codec.init_streaming_state(batch=2)
    outs = []
    for f in range(0, n_frames, 2):
        chunk, state = codec.decode_chunk(jnp.asarray(toks[:, f : f + 2]), state)
        outs.append(np.asarray(chunk))
    stream_sig = np.concatenate(outs, axis=1)

    assert stream_sig.shape == batch_sig.shape
    np.testing.assert_allclose(stream_sig, batch_sig, atol=1e-5, rtol=1e-4)


def test_encodec_streaming_constant_pad(rng):
    """EnCodec-family streaming: chunked == batch for constant padding."""
    from audiocodecs_tpu.models.encodec import Encodec, EncodecModelConfig

    cfg = EncodecModelConfig(
        sampling_rate=800, num_filters=4, hidden_size=16,
        upsampling_ratios=(4, 2), codebook_size=32, codebook_dim=16,
        num_quantizers=4, pad_mode="constant",
    )
    c = Encodec(800, 800, num_codebooks=4, model_config=cfg,
                key=jax.random.PRNGKey(1))
    frame = c.frame_size  # 8
    sig = rng.standard_normal((2, frame * 20)).astype(np.float32)
    batch_toks = np.asarray(c.sig_to_toks(jnp.asarray(sig)))
    batch_sig = np.asarray(c.toks_to_sig(jnp.asarray(batch_toks)))

    enc_state = c.init_streaming_state(2)
    dec_state = c.init_streaming_state(2)
    toks_out, wav_out = [], []
    for f in range(0, 20, 4):
        chunk = jnp.asarray(sig[:, f * frame : (f + 4) * frame])
        toks, enc_state = c.encode_chunk(chunk, enc_state)
        wav, dec_state = c.decode_chunk(toks, dec_state)
        toks_out.append(np.asarray(toks))
        wav_out.append(np.asarray(wav))
    assert (np.concatenate(toks_out, 1) == batch_toks).mean() == 1.0
    np.testing.assert_allclose(np.concatenate(wav_out, 1), batch_sig,
                               atol=1e-5)


def test_seanet_rvq_streaming(rng):
    """HILCodec (causal towers + non-overlapping waveform-skip pooling)
    chunked == batch, carried per-conv state."""
    from audiocodecs_tpu.models.hilcodec import (
        HILCodec,
        HILCodecModelConfig,
    )

    cfg = HILCodecModelConfig(
        sampling_rate=24000, channels=4, max_channels=16, strides=(4, 2),
        emb_dim=8, codebook_size=32, num_quantizers=4)
    c = HILCodec(24000, 24000, num_codebooks=3, model_config=cfg,
                 key=jax.random.PRNGKey(2))
    frame = c.frame_size
    sig = rng.standard_normal((1, frame * 12)).astype(np.float32)
    want = np.asarray(c.sig_to_toks(jnp.asarray(sig)))
    state = c.init_streaming_state(1)
    outs = []
    for f in range(0, 12, 3):
        toks, state = c.encode_chunk(
            jnp.asarray(sig[:, f * frame : (f + 3) * frame]), state
        )
        outs.append(np.asarray(toks))
    assert (np.concatenate(outs, 1) == want).mean() == 1.0


def test_streaming_varying_chunk_sizes(rng, codec):
    """1-frame and 3-frame chunks give identical tokens."""
    frame = codec.frame_size
    n_frames = 6
    sig = rng.standard_normal((1, frame * n_frames)).astype(np.float32)
    ref = np.asarray(codec.sig_to_toks(jnp.asarray(sig)))

    state = codec.init_streaming_state(batch=1)
    outs = []
    plan = [1, 3, 2]
    pos = 0
    for m in plan:
        chunk = jnp.asarray(sig[:, pos * frame : (pos + m) * frame])
        toks, state = codec.encode_chunk(chunk, state)
        outs.append(np.asarray(toks))
        pos += m
    got = np.concatenate(outs, axis=1)
    assert (got == ref).mean() == 1.0
