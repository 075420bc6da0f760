"""First-party UTMOS (reference downloads utmos22_strong via torch.hub,
``metrics/utmos.py:30-54``): converter structural roundtrip, torch oracle
for the conditioning+BLSTM+projection head, end-to-end scoring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiocodecs_tpu.downstream.metrics.utmos import (
    UTMOSConfig,
    apply_utmos,
    convert_utmos_state_dict,
    init_utmos_params,
    score_from_feats,
    utmos_schema,
)
from audiocodecs_tpu.nn.wavlm import WavLMConfig


def tiny_cfg():
    return UTMOSConfig(
        ssl=WavLMConfig(hidden_size=16, num_layers=2, num_heads=2,
                        intermediate_size=32, conv_dim=(8, 8),
                        conv_kernel=(10, 4), conv_stride=(5, 2),
                        num_conv_pos_embeddings=16,
                        num_conv_pos_embedding_groups=4,
                        gated_rel_pos=False),
        emb_dim=4, num_domains=2, num_judges=8, blstm_hidden=8,
        proj_hidden=16, judge_id=3)


def synth(schema, seed=0):
    rng = np.random.default_rng(seed)
    return {k: rng.standard_normal(s).astype(np.float32) * 0.2
            for k, s in schema.items()}


@pytest.mark.parametrize("layout", ["hub", "lightning"])
def test_utmos_converter_structure(layout):
    """Both documented vendor layouts convert (hub = tarepan/SpeechMOS —
    what the reference torch.hub-loads; lightning = original
    sarulab-speech training checkpoint); the converter auto-detects."""
    cfg = tiny_cfg()
    sd = synth(utmos_schema(cfg, layout=layout))
    params = convert_utmos_state_dict(sd, cfg)
    init = init_utmos_params(jax.random.PRNGKey(0), cfg)
    from tests.test_zoo_converters import assert_same_structure

    assert_same_structure(params, init, "utmos")

    bad = dict(sd)
    bad["mystery.weight"] = np.zeros((4, 4), np.float32)
    with pytest.raises(ValueError, match="unmapped"):
        convert_utmos_state_dict(bad, cfg)


def test_utmos_hub_vectors_tile_into_tables():
    """Hub-layout single domain/judge vectors are tiled so ANY configured
    id indexes the checkpoint's inference embedding — scoring must not
    depend on domain_id/judge_id."""
    import dataclasses

    cfg = tiny_cfg()
    sd = synth(utmos_schema(cfg, layout="hub"))
    params = convert_utmos_state_dict(sd, cfg)
    assert params["domain_emb"].shape == (cfg.num_domains, cfg.emb_dim)
    assert params["judge_emb"].shape == (cfg.num_judges, cfg.emb_dim)
    np.testing.assert_array_equal(params["domain_emb"][0],
                                  sd["domain_emb"])
    np.testing.assert_array_equal(params["judge_emb"][-1],
                                  sd["judge_emb"])

    feats = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 6, cfg.ssl.hidden_size)).astype(np.float32))
    a = score_from_feats(params, feats, cfg)
    b = score_from_feats(
        params, feats, dataclasses.replace(cfg, domain_id=1, judge_id=0))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_utmos_head_matches_torch_oracle():
    """Conditioning + BLSTM + projection vs a torch replica of the
    documented structure (the SSL tower has its own HF oracles)."""
    import torch

    cfg = tiny_cfg()
    sd = synth(utmos_schema(cfg, layout="lightning"))
    params = convert_utmos_state_dict(sd, cfg)
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((2, 12, cfg.ssl.hidden_size)).astype(
        np.float32)

    got = np.asarray(score_from_feats(params, jnp.asarray(feats), cfg))

    with torch.no_grad():
        t = torch.from_numpy
        dom = t(sd["domain_emb.weight"])[cfg.domain_id]
        jud = t(sd["judge_emb.weight"])[cfg.judge_id]
        x = torch.cat([
            t(feats),
            torch.cat([dom, jud]).expand(2, 12, -1)], dim=-1)
        lstm = torch.nn.LSTM(cfg.feat_dim, cfg.blstm_hidden,
                             batch_first=True, bidirectional=True)
        lstm.weight_ih_l0.copy_(t(sd["blstm.weight_ih_l0"]))
        lstm.weight_hh_l0.copy_(t(sd["blstm.weight_hh_l0"]))
        lstm.bias_ih_l0.copy_(t(sd["blstm.bias_ih_l0"]))
        lstm.bias_hh_l0.copy_(t(sd["blstm.bias_hh_l0"]))
        lstm.weight_ih_l0_reverse.copy_(t(sd["blstm.weight_ih_l0_reverse"]))
        lstm.weight_hh_l0_reverse.copy_(t(sd["blstm.weight_hh_l0_reverse"]))
        lstm.bias_ih_l0_reverse.copy_(t(sd["blstm.bias_ih_l0_reverse"]))
        lstm.bias_hh_l0_reverse.copy_(t(sd["blstm.bias_hh_l0_reverse"]))
        y, _ = lstm(x)
        y = torch.relu(
            y @ t(sd["head.0.weight"]).T + t(sd["head.0.bias"]))
        y = y @ t(sd["head.3.weight"]).T + t(sd["head.3.bias"])
        want = (y[..., 0].mean(dim=1) * 2.0 + 3.0).numpy()

    np.testing.assert_allclose(got, want, atol=1e-4)


def test_utmos_end_to_end_scoring(tmp_path):
    cfg = tiny_cfg()
    params = init_utmos_params(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 1600)).astype(np.float32) * 0.1)
    mos = apply_utmos(params, wav, cfg)
    assert mos.shape == (2,) and bool(jnp.isfinite(mos).all())

    # metric wrapper from a saved npz
    from audiocodecs_tpu.downstream.metrics.utmos import (
        make_utmos_jax_metric,
    )
    from audiocodecs_tpu.utils.checkpoint import save_params

    p = tmp_path / "utmos.npz"
    save_params(str(p), params)
    stats = make_utmos_jax_metric(str(p), cfg)
    scores = stats.metric([np.asarray(wav[0])], 16000)
    assert len(scores) == 1 and np.isfinite(scores[0])


def test_bilstm_masked_matches_unpadded():
    """bilstm_masked outputs at valid positions are bit-equal to bilstm on
    the unpadded row — the guarantee behind bucketed UTMOS scoring."""
    from audiocodecs_tpu.nn.lstm import (
        bilstm,
        bilstm_masked,
        init_bilstm_params,
    )

    rng = np.random.default_rng(0)
    params = init_bilstm_params(jax.random.PRNGKey(1), 2, 8, 6)
    lens = [5, 9, 12]
    T = 12
    rows = [rng.standard_normal((n, 8)).astype(np.float32) for n in lens]
    padded = np.zeros((len(rows), T, 8), np.float32)
    for i, r in enumerate(rows):
        padded[i, : r.shape[0]] = r
    got = np.asarray(bilstm_masked(jnp.asarray(padded), params,
                                   jnp.asarray(lens)))
    for i, r in enumerate(rows):
        want = np.asarray(bilstm(jnp.asarray(r)[None], params))[0]
        np.testing.assert_allclose(got[i, : lens[i]], want, atol=1e-6)


def test_utmos_bucketed_scoring(tmp_path):
    """bucket_seconds pads to a fixed shape set; zero extra padding gives
    the exact score, and padded scoring stays finite/close on the tiny
    model (head-side masking exact; SSL sees the padding)."""
    from audiocodecs_tpu.downstream.metrics.utmos import (
        make_utmos_jax_metric,
    )
    from audiocodecs_tpu.utils.checkpoint import save_params

    cfg = tiny_cfg()
    params = init_utmos_params(jax.random.PRNGKey(0), cfg)
    p = tmp_path / "utmos.npz"
    save_params(str(p), params)
    sig = (np.random.default_rng(1).standard_normal(1600) * 0.1
           ).astype(np.float32)

    exact = make_utmos_jax_metric(str(p), cfg).metric([sig], 16000)[0]
    # bucket equal to the signal length → no padding → identical score
    same = make_utmos_jax_metric(
        str(p), cfg, bucket_seconds=0.1).metric([sig], 16000)[0]
    np.testing.assert_allclose(same, exact, atol=1e-5)
    # a coarser bucket pads: still finite and in the MOS range
    padded = make_utmos_jax_metric(
        str(p), cfg, bucket_seconds=0.15).metric([sig], 16000)[0]
    assert np.isfinite(padded)
