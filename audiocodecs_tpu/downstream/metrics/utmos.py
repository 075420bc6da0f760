"""First-party UTMOS (UTMOS22-strong) predicted-MOS metric, on-device.

The reference downloads ``tarepan/SpeechMOS`` ``utmos22_strong`` via
torch.hub (reference ``metrics/utmos.py:30-54``); this module implements
the architecture first-party in JAX so a converted checkpoint runs on the
TPU like DNSMOS does (``downstream/metrics/dnsmos.py``), with the gated
torch wrapper (``external.make_utmos_metric``) kept for TorchScript files.

Architecture (UTMOS22 strong, sarulab-speech/UTMOS22 — reconstructed;
CONFIDENCE: the SSL tower is standard wav2vec2-base (HF-naming converter
reused, oracle-tested elsewhere); the listener/domain conditioning + BLSTM
+ projection head follow the public paper/repo description, exact naming
is a documented guess — diff a real checkpoint before trusting):

  wav [B, T] → wav2vec2-base features [B, N, 768]
    ⊕ domain embedding (id 0)  [128]
    ⊕ judge embedding (mean-listener id) [128]
  → BiLSTM(1024 → 2·512) → Linear(1024→2048) → ReLU → Linear(2048→1)
  → mean over frames → ×2 + 3  (speechmos score scaling)
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.lstm import bilstm, init_bilstm_params
from audiocodecs_tpu.nn.wavlm import WavLMConfig, apply_wavlm

__all__ = ["UTMOSConfig", "init_utmos_params", "apply_utmos",
           "convert_utmos_state_dict", "utmos_schema",
           "make_utmos_jax_metric"]


def _w2v2_base() -> WavLMConfig:
    # facebook/wav2vec2-base: plain softmax attention (no gated rel-pos),
    # post-norm encoder, group-norm feature extractor, no conv bias.
    return WavLMConfig(gated_rel_pos=False)


@dataclasses.dataclass(frozen=True)
class UTMOSConfig:
    ssl: WavLMConfig = dataclasses.field(default_factory=_w2v2_base)
    emb_dim: int = 128
    num_domains: int = 3
    num_judges: int = 3380
    blstm_hidden: int = 512
    proj_hidden: int = 2048
    domain_id: int = 0
    judge_id: int = 288  # mean-listener id used at inference (speechmos)

    @property
    def feat_dim(self) -> int:
        return self.ssl.hidden_size + 2 * self.emb_dim


def init_utmos_params(key, cfg: UTMOSConfig):
    from audiocodecs_tpu.models.wavlm_kmeans import _init_wavlm_params

    ks = jax.random.split(key, 6)
    H = cfg.feat_dim
    return {
        "ssl": _init_wavlm_params(ks[0], cfg.ssl),
        "domain_emb": jax.random.normal(
            ks[1], (cfg.num_domains, cfg.emb_dim)) * 0.02,
        "judge_emb": jax.random.normal(
            ks[2], (cfg.num_judges, cfg.emb_dim)) * 0.02,
        "blstm": init_bilstm_params(ks[3], 1, H, cfg.blstm_hidden),
        "head_in": {
            "w": jax.random.normal(
                ks[4], (2 * cfg.blstm_hidden, cfg.proj_hidden))
            * (2 * cfg.blstm_hidden) ** -0.5,
            "b": jnp.zeros((cfg.proj_hidden,)),
        },
        "head_out": {
            "w": jax.random.normal(ks[5], (cfg.proj_hidden, 1))
            * cfg.proj_hidden**-0.5,
            "b": jnp.zeros((1,)),
        },
    }


def score_from_feats(params, feats: jax.Array,
                     cfg: UTMOSConfig) -> jax.Array:
    """SSL features [B, N, H] → predicted MOS [B] (oracle-testable head)."""
    B, N = feats.shape[0], feats.shape[1]
    dom = params["domain_emb"][cfg.domain_id]
    jud = params["judge_emb"][cfg.judge_id]
    cond = jnp.broadcast_to(
        jnp.concatenate([dom, jud])[None, None], (B, N, 2 * dom.shape[-1]))
    x = jnp.concatenate([feats, cond], axis=-1)
    x = bilstm(x, params["blstm"])  # [B, N, 2H]
    x = x @ params["head_in"]["w"] + params["head_in"]["b"]
    x = jax.nn.relu(x)
    x = x @ params["head_out"]["w"] + params["head_out"]["b"]  # [B, N, 1]
    return jnp.mean(x[..., 0], axis=1) * 2.0 + 3.0


def apply_utmos(params, wav: jax.Array, cfg: UTMOSConfig) -> jax.Array:
    """``wav`` [B, T] @ 16 kHz → predicted MOS [B] (1–5 scale)."""
    feats = apply_wavlm(params["ssl"], wav, cfg.ssl)  # [B, N, 768]
    return score_from_feats(params, feats, cfg)


def conv_frames(n_samples, cfg: UTMOSConfig):
    """Valid-frame count of the SSL feature extractor for a waveform of
    ``n_samples`` (same arithmetic as the conv stack: n=(n-k)//s+1)."""
    n = n_samples
    for k, s in zip(cfg.ssl.conv_kernel, cfg.ssl.conv_stride):
        n = (n - k) // s + 1
    return n


def apply_utmos_padded(params, wav: jax.Array, n_samples: jax.Array,
                       cfg: UTMOSConfig) -> jax.Array:
    """MOS over zero-padded rows: head runs a masked BiLSTM + masked frame
    mean over the valid frames only (bit-equal to the unpadded head given
    the same features). The SSL tower itself still attends over padded
    frames — a small approximation vs per-length exact scoring, traded
    for a bounded number of compiled shapes (see ``bucket_seconds``)."""
    from audiocodecs_tpu.nn.lstm import bilstm_masked

    feats = apply_wavlm(params["ssl"], wav, cfg.ssl)  # [B, Nb, 768]
    B, Nb = feats.shape[0], feats.shape[1]
    n_valid = jnp.minimum(conv_frames(n_samples, cfg), Nb)
    dom = params["domain_emb"][cfg.domain_id]
    jud = params["judge_emb"][cfg.judge_id]
    cond = jnp.broadcast_to(
        jnp.concatenate([dom, jud])[None, None], (B, Nb, 2 * dom.shape[-1]))
    x = jnp.concatenate([feats, cond], axis=-1)
    x = bilstm_masked(x, params["blstm"], n_valid)
    x = x @ params["head_in"]["w"] + params["head_in"]["b"]
    x = jax.nn.relu(x)
    x = x @ params["head_out"]["w"] + params["head_out"]["b"]
    mask = (jnp.arange(Nb)[None] < n_valid[:, None]).astype(x.dtype)
    mean = (x[..., 0] * mask).sum(1) / jnp.maximum(n_valid, 1)
    return mean * 2.0 + 3.0


def utmos_schema(cfg: UTMOSConfig, layout: str = "hub") -> dict:
    """Documented torch key → shape map, two candidate vendor layouts.

    ``layout="hub"`` (PRIMARY — what the reference actually loads,
    ``torch.hub.load("tarepan/SpeechMOS:v1.2.0", "utmos22_strong")``,
    reference ``metrics/utmos.py:35-37``): inference-only module names
    from the public SpeechMOS repo (``speechmos/utmos22/strong/model.py``:
    ``wav2vec2`` SSL tower, single-VECTOR ``domain_emb``/``judge_emb``
    parameters — the hub model fixes domain 0 + mean-listener judge —
    ``blstm``, ``projection`` Sequential head). The SSL sub-key naming
    under ``wav2vec2.`` is this repo's HF-style map and is the
    least-certain piece (SpeechMOS vendors a fairseq-lineage w2v2 whose
    sub-module names may differ) — diff first.

    ``layout="lightning"``: the original sarulab-speech/UTMOS22 training
    checkpoint shape — full embedding TABLES (``nn.Embedding`` over
    domains/judges) and a ``head.*`` Sequential.
    """
    from audiocodecs_tpu.convert.zoo import _wavlm_schema

    H, E = cfg.feat_dim, cfg.emb_dim
    h = cfg.blstm_hidden
    if layout == "hub":
        s = dict(_wavlm_schema(cfg.ssl, prefix="wav2vec2."))
        s["domain_emb"] = (E,)
        s["judge_emb"] = (E,)
        head = "projection"
    elif layout == "lightning":
        s = dict(_wavlm_schema(cfg.ssl, prefix="ssl."))
        s["domain_emb.weight"] = (cfg.num_domains, E)
        s["judge_emb.weight"] = (cfg.num_judges, E)
        head = "head"
    else:
        raise ValueError(f"unknown utmos layout {layout!r}")
    for suffix in ("", "_reverse"):
        s[f"blstm.weight_ih_l0{suffix}"] = (4 * h, H)
        s[f"blstm.weight_hh_l0{suffix}"] = (4 * h, h)
        s[f"blstm.bias_ih_l0{suffix}"] = (4 * h,)
        s[f"blstm.bias_hh_l0{suffix}"] = (4 * h,)
    s[f"{head}.0.weight"] = (cfg.proj_hidden, 2 * h)
    s[f"{head}.0.bias"] = (cfg.proj_hidden,)
    s[f"{head}.3.weight"] = (1, cfg.proj_hidden)
    s[f"{head}.3.bias"] = (1,)
    return s


def convert_utmos_state_dict(sd, cfg: UTMOSConfig, key_map=None) -> dict:
    """Strict conversion; auto-detects the vendor layout (hub vs
    lightning, see :func:`utmos_schema`). Hub-layout single-vector
    embeddings are tiled into the full tables so any configured
    ``domain_id``/``judge_id`` indexes the checkpoint's vector. SSL
    sub-key naming deviations are fixed data-only via ``key_map``
    (overlay dict or JSON path, see :mod:`convert.overlay`)."""
    from audiocodecs_tpu.convert.overlay import apply_key_map
    from audiocodecs_tpu.convert.vendor_seanet import _bilstm_layer_params
    from audiocodecs_tpu.convert.wavlm import convert_wavlm_state_dict
    from audiocodecs_tpu.convert.zoo import (
        _TrackingDict,
        _unmapped,
        _wavlm_schema,
        to_np,
    )

    sd = _TrackingDict(apply_key_map(sd, key_map))
    hub = "projection.0.weight" in sd or any(
        k.startswith("wav2vec2.") for k in sd)
    ssl_prefix = "wav2vec2." if hub else "ssl."
    head = "projection" if hub else "head"

    if "domain_emb.weight" in sd:  # lightning: full tables
        domain = to_np(sd["domain_emb.weight"]).astype(np.float32)
        judge = to_np(sd["judge_emb.weight"]).astype(np.float32)
    else:  # hub: single inference vectors → tile into the tables
        dv = to_np(sd["domain_emb"]).astype(np.float32).reshape(-1)
        jv = to_np(sd["judge_emb"]).astype(np.float32).reshape(-1)
        domain = np.tile(dv, (cfg.num_domains, 1))
        judge = np.tile(jv, (cfg.num_judges, 1))

    params = {
        "ssl": convert_wavlm_state_dict(sd, cfg.ssl, prefix=ssl_prefix),
        "domain_emb": domain,
        "judge_emb": judge,
        "blstm": _bilstm_layer_params(sd, "blstm", 1),
        "head_in": {
            "w": np.ascontiguousarray(
                to_np(sd[f"{head}.0.weight"]).astype(np.float32).T),
            "b": to_np(sd[f"{head}.0.bias"]).astype(np.float32),
        },
        "head_out": {
            "w": np.ascontiguousarray(
                to_np(sd[f"{head}.3.weight"]).astype(np.float32).T),
            "b": to_np(sd[f"{head}.3.bias"]).astype(np.float32),
        },
    }
    for k in set(_wavlm_schema(cfg.ssl, prefix=ssl_prefix)):
        if k in sd:
            sd.read.add(k)
    extra = _unmapped(sd, sd.read)
    if extra:
        raise ValueError(
            f"utmos: {len(extra)} unmapped checkpoint keys — schema drift "
            f"from the documented layouts (hub/lightning, see "
            f"utmos_schema). First few: {extra[:8]}")
    return params


def make_utmos_jax_metric(params_path: str, cfg: UTMOSConfig | None = None,
                          bucket_seconds: float = 0.0):
    """On-device UTMOS MetricStats from a converted ``.npz`` param file.

    ``bucket_seconds > 0`` pads each utterance up to the next multiple and
    scores through :func:`apply_utmos_padded` — one compiled shape per
    bucket instead of one per distinct utterance length (each recompile of
    the SSL tower costs tens of seconds on TPU). Head-side masking is
    exact; the SSL tower sees the zero padding (small score deviation).
    Default 0 keeps the reference's exact per-length behavior.
    """
    from audiocodecs_tpu.downstream.metrics.base import MetricStats
    from audiocodecs_tpu.utils.checkpoint import load_params

    cfg = cfg or UTMOSConfig()
    params = jax.device_put(load_params(params_path))

    @jax.jit
    def score(wav):
        return apply_utmos(params, wav, cfg)

    @jax.jit
    def score_padded(wav, n_samples):
        return apply_utmos_padded(params, wav, n_samples, cfg)

    def one(s: np.ndarray) -> float:
        s = np.asarray(s, np.float32)
        if bucket_seconds > 0:
            step = max(1, int(round(bucket_seconds * 16000)))
            pad_to = ((s.shape[-1] + step - 1) // step) * step
            padded = np.zeros((pad_to,), np.float32)
            padded[: s.shape[-1]] = s
            return float(score_padded(jnp.asarray(padded)[None],
                                      jnp.asarray([s.shape[-1]]))[0])
        return float(score(jnp.asarray(s)[None])[0])

    def metric(sigs, sample_rate: int):
        if sample_rate != 16000:
            from audiocodecs_tpu.resample import resample

            sigs = [np.asarray(resample(jnp.asarray(s)[None], sample_rate,
                                        16000))[0] for s in sigs]
        return [one(s) for s in sigs]

    return MetricStats(metric, name="UTMOS")
