"""Heterogeneous per-codebook vocab sizes through multihead layers, the
Codec config, and a downstream recipe (reference ``multihead.py:37-43``;
SemantiCodec's semantic≠acoustic vocabs, reference
``semanticodec.py:34-35,66``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.models.multihead import (
    fused_table_from_embs,
    init_multihead_embedding,
    init_multihead_linear,
    multihead_embed,
    multihead_logits,
    vocab_offsets,
)


def test_vocab_offsets():
    np.testing.assert_array_equal(vocab_offsets(4, 3), [0, 4, 8])
    np.testing.assert_array_equal(vocab_offsets([4, 8, 2], 3), [0, 4, 12])
    with pytest.raises(ValueError):
        vocab_offsets([4, 8], 3)


def test_hetero_embed_rows(rng):
    key = jax.random.PRNGKey(0)
    sizes = [4, 8]
    params = init_multihead_embedding(key, 2, sizes, 6)
    assert params["table"].shape == (12, 6)
    toks = jnp.asarray([[[3, 7]]])  # codebook 0 tok 3 → row 3; cb 1 tok 7 → 4+7
    out = multihead_embed(params, toks, vocab_size=sizes)
    np.testing.assert_allclose(out[0, 0, 0], params["table"][3])
    np.testing.assert_allclose(out[0, 0, 1], params["table"][11])


def test_hetero_embed_padding_is_vocab():
    key = jax.random.PRNGKey(1)
    sizes = [4, 8]
    params = init_multihead_embedding(key, 2, sizes, 6, pad_row=True)
    assert params["table"].shape == (13, 6)
    # reference padding_idx semantics: token == C_k maps to the pad row
    toks = jnp.asarray([[[4, 8]]])
    out = multihead_embed(params, toks, vocab_size=sizes, pad_is_vocab=True)
    np.testing.assert_allclose(np.asarray(out[0, 0, 0]),
                               np.asarray(params["table"][-1]))
    np.testing.assert_allclose(np.asarray(out[0, 0, 1]),
                               np.asarray(params["table"][-1]))


def test_hetero_logits_padding(rng):
    key = jax.random.PRNGKey(2)
    sizes = (4, 8)
    params = init_multihead_linear(key, 16, 2, sizes)
    assert params["w"].shape == (16, 12)
    x = jnp.asarray(rng.standard_normal((2, 3, 16)), jnp.float32)
    y = multihead_logits(params, x, num_heads=2, vocab_size=sizes)
    assert y.shape == (2, 3, 2, 8)
    got = np.asarray(y)
    assert (got[..., 0, 4:] <= -1e8).all()  # codebook 0 tail is masked
    assert np.isfinite(got[..., 1, :]).all()
    # softmax over the padded axis puts zero mass on the tail
    p = np.asarray(jax.nn.softmax(y, axis=-1))
    assert p[..., 0, 4:].max() < 1e-12
    # argmax never selects a padded entry
    assert (np.asarray(jnp.argmax(y, -1))[..., 0] < 4).all()


def test_hetero_logits_grads_finite(rng):
    key = jax.random.PRNGKey(3)
    sizes = (4, 8)
    params = init_multihead_linear(key, 8, 2, sizes)
    x = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    labels = jnp.asarray([[1, 5], [3, 0]], jnp.int32)

    def loss(p):
        import optax

        lg = multihead_logits(p, x, num_heads=2, vocab_size=sizes)
        return optax.softmax_cross_entropy_with_integer_labels(
            lg, labels).mean()

    g = jax.grad(loss)(params)
    assert all(np.isfinite(np.asarray(v)).all() for v in g.values())


def test_fused_table_from_embs_hetero():
    ce = np.arange(2 * 8 * 3, dtype=np.float32).reshape(2, 8, 3)
    table = fused_table_from_embs(ce, [4, 8], dim=5)
    assert table.shape == (12, 5)
    np.testing.assert_allclose(table[:4, :3], ce[0, :4])
    np.testing.assert_allclose(table[4:, :3], ce[1])
    assert (table[:, 3:] == 0).all()


def test_codec_config_vocab_sizes_validation():
    from audiocodecs_tpu.codec import CodecConfig

    cfg = CodecConfig(16000, 16000, num_codebooks=2, vocab_size=8,
                      vocab_sizes=(4, 8))
    assert cfg.vocab_sizes == (4, 8)
    with pytest.raises(ValueError):
        CodecConfig(16000, 16000, num_codebooks=2, vocab_size=8,
                    vocab_sizes=(4, 6))  # max mismatch
    with pytest.raises(ValueError):
        CodecConfig(16000, 16000, num_codebooks=3, vocab_size=8,
                    vocab_sizes=(4, 8))  # K mismatch


def test_semanticodec_declares_hetero_vocabs():
    from audiocodecs_tpu.models.semanticodec import (
        SemantiCodec,
        SemantiCodecModelConfig,
    )

    mc = SemantiCodecModelConfig(semantic_vocab=4096, acoustic_vocab=8192,
                                 mel_bins=16, window_frames=32, patch_size=4,
                                 vit_hidden=16, vit_layers=1, vit_heads=2,
                                 denoiser_hidden=16, denoiser_layers=1,
                                 denoiser_heads=2, ddim_steps=2,
                                 decoder_variant="analog")
    codec = SemantiCodec(16000, 16000, model_config=mc,
                         key=jax.random.PRNGKey(0))
    assert codec.config.vocab_sizes == (4096, 8192)
    assert codec.config.vocab_size == 8192

    from audiocodecs_tpu.downstream.recipes.common import vocab_spec

    assert vocab_spec(codec) == (4096, 8192)


def test_classification_recipe_hetero_vocabs(tmp_path):
    """VERDICT done-criterion: a recipe smoke test with K=2 and vocabs
    (4096, 8192) flowing through embedding + pooling + head."""
    from audiocodecs_tpu.downstream.datasets.synthetic import (
        prepare_synthetic,
    )
    from audiocodecs_tpu.downstream.recipes.classification import (
        run_classification,
    )

    manifests = prepare_synthetic(str(tmp_path / "corpus"), sample_rate=16000,
                                  num_utts=4, min_seconds=0.3,
                                  max_seconds=0.5)
    cfg = {
        "sample_rate": 16000,
        "codec": {
            "name": "semanticodec",
            "orig_sample_rate": 16000,
            "num_codebooks": 2,
            "model_overrides": {
                "sampling_rate": 16000, "semantic_vocab": 4096,
                "acoustic_vocab": 8192, "mel_bins": 16, "window_frames": 32,
                "patch_size": 4, "vit_hidden": 16, "vit_layers": 1,
                "vit_heads": 2, "denoiser_hidden": 16, "denoiser_layers": 1,
                "denoiser_heads": 2, "ddim_steps": 2,
            },
        },
        "train_csv": manifests["train"],
        "valid_csv": manifests["valid"],
        "test_csv": manifests["test"],
        "output_folder": str(tmp_path / "out"),
        "label_field": "utt_label",
        "batch_size": 2,
        "num_length_buckets": 1,
        "epochs": 1,
        "probe_hidden": 8,
        "embedding_dim_probe": 8,
        "seed": 0,
    }
    summary = run_classification(cfg)
    assert 0.0 <= summary["test_ER"] <= 1.0

def test_hetero_vocab_token_corruption_stays_in_vocab(rng):
    """resample() on a heterogeneous-vocab codec must never emit ids >=
    that codebook's vocab (embs() zero-pads; logits masks the padding)."""
    import jax

    from audiocodecs_tpu.models.semanticodec import (
        SemantiCodec,
        SemantiCodecModelConfig,
    )

    cfg = SemantiCodecModelConfig(
        mel_bins=16, window_frames=32, patch_size=4, vit_hidden=16,
        vit_layers=1, vit_heads=2, stack_factor=2, semantic_vocab=32,
        acoustic_vocab=8, denoiser_hidden=16, denoiser_layers=1,
        denoiser_heads=2, ddim_steps=2, decoder_variant="analog")
    c = SemantiCodec(16000, 16000, model_config=cfg)
    toks = jnp.asarray(
        np.stack([rng.integers(0, 32, (2, 40)),
                  rng.integers(0, 8, (2, 40))], axis=-1), jnp.int32)
    out = c.resample(toks, p=1.0, key=jax.random.PRNGKey(0))
    assert int(jnp.max(out[..., 0])) < 32
    assert int(jnp.max(out[..., 1])) < 8  # padded rows never sampled
