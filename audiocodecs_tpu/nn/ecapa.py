"""ECAPA-TDNN speaker embedding tower (wespeaker ``ECAPA_TDNN_GLOB_c512``),
TPU-native.

BiCodec's speaker encoder runs a wespeaker-style ECAPA-TDNN over 100-bin
mels before the perceiver/FSQ global-token stage (Spark-TTS
``modules/speaker/speaker_encoder.py`` behind the reference wrapper
``audiocodecs/bicodec.py:30-59``). Structure (wespeaker semantics):

  * ``layer1``: Conv1dReluBn k5 (conv → ReLU → BatchNorm);
  * ``layer2..4``: SE-Res2Blocks at dilation 2/3/4 — 1×1 Conv1dReluBn →
    Res2Conv1dReluBn (scale-8: the first ``scale−1`` groups run a carried
    conv→ReLU→BN cascade, the LAST group passes through) → 1×1
    Conv1dReluBn → squeeze-excitation (bottleneck 128), residual add;
  * ``conv``: 1×1 over the concat of layers 2–4 (3·C) + ReLU;
  * global-context **attentive statistics pooling** ([x, μ, σ] context) →
    BN → linear to the embedding.

BatchNorms run in inference form (affine with running stats). All convs are
dense MXU matmuls; the Res2 cascade unrolls at trace time.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import conv1d, pad1d

__all__ = ["EcapaConfig", "apply_ecapa", "init_ecapa_params"]


@dataclasses.dataclass(frozen=True)
class EcapaConfig:
    feat_dim: int = 100
    channels: int = 512
    embed_dim: int = 1024
    scale: int = 8
    attn_hidden: int = 128
    se_bottleneck: int = 128

    @property
    def cat_channels(self) -> int:
        return 3 * self.channels


def _bn(x, p, eps: float = 1e-5):
    """Inference BatchNorm over the channel (last) axis."""
    scale = p["g"] * jax.lax.rsqrt(p["var"] + eps)
    return (x - p["mean"]) * scale + p["b"]


def _conv_relu_bn(x, p, k: int, dilation: int = 1):
    span = (k - 1) * dilation
    x = pad1d(x, span // 2, span - span // 2, mode="constant")
    x = conv1d(x, p["conv"]["w"], p["conv"].get("b"), dilation=dilation)
    return _bn(jax.nn.relu(x), p["bn"])


def _res2_conv(x, p, k: int, dilation: int, scale: int):
    """wespeaker Res2Conv1dReluBn: carried conv→ReLU→BN cascade over the
    first ``scale−1`` groups; the last group passes through."""
    parts = jnp.split(x, scale, axis=-1)
    outs = []
    sp = None
    span = (k - 1) * dilation
    for i in range(scale - 1):
        sp = parts[i] if sp is None else sp + parts[i]
        h = pad1d(sp, span // 2, span - span // 2, mode="constant")
        h = conv1d(h, p["convs"][i]["w"], p["convs"][i].get("b"),
                   dilation=dilation)
        sp = _bn(jax.nn.relu(h), p["bns"][i])
        outs.append(sp)
    outs.append(parts[-1])
    return jnp.concatenate(outs, axis=-1)


def _se(x, p):
    s = jnp.mean(x, axis=1, keepdims=True)  # [B, 1, C]
    s = jax.nn.relu(jnp.einsum("boc,cd->bod", s, p["w1"]) + p["b1"])
    s = jax.nn.sigmoid(jnp.einsum("bod,dc->boc", s, p["w2"]) + p["b2"])
    return x * s


def _se_res2_block(x, p, k: int, dilation: int, scale: int):
    h = _conv_relu_bn(x, p["in"], 1)
    h = _res2_conv(h, p["res2"], k, dilation, scale)
    h = _conv_relu_bn(h, p["out"], 1)
    return x + _se(h, p["se"])


def apply_ecapa(params, mel: jax.Array, cfg: EcapaConfig,
                return_frames: bool = False):
    """``[B, T, feat_dim]`` mel frames → ``[B, embed_dim]`` x-vector.

    ``return_frames`` also yields the pre-pooling frame features
    ``[B, T, cat_channels]`` — BiCodec's perceiver context."""
    x1 = _conv_relu_bn(mel, params["layer1"], 5)
    x2 = _se_res2_block(x1, params["layer2"], 3, 2, cfg.scale)
    x3 = _se_res2_block(x2, params["layer3"], 3, 3, cfg.scale)
    x4 = _se_res2_block(x3, params["layer4"], 3, 4, cfg.scale)
    frames = jnp.concatenate([x2, x3, x4], axis=-1)
    x = jax.nn.relu(
        conv1d(frames, params["conv"]["w"], params["conv"].get("b")))

    # global-context attentive statistics pooling
    mu = jnp.mean(x, axis=1, keepdims=True)
    sg = jnp.sqrt(jnp.clip(jnp.var(x, axis=1, keepdims=True), 1e-7))
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(mu, x.shape), jnp.broadcast_to(sg, x.shape)],
        axis=-1)
    a = jnp.tanh(
        jnp.einsum("btc,cd->btd", ctx, params["attn1"]["w"])
        + params["attn1"]["b"])
    a = jnp.einsum("btd,dc->btc", a, params["attn2"]["w"]) + (
        params["attn2"]["b"])
    a = jax.nn.softmax(a, axis=1)  # [B, T, C]
    mean = jnp.sum(a * x, axis=1)
    var = jnp.sum(a * x * x, axis=1) - mean**2
    std = jnp.sqrt(jnp.clip(var, 1e-7))
    stats = jnp.concatenate([mean, std], axis=-1)  # [B, 2·cat]
    stats = _bn(stats, params["pool_bn"])
    emb = jnp.einsum("bc,cd->bd", stats, params["linear"]["w"]) + (
        params["linear"]["b"])
    if return_frames:
        return emb, frames
    return emb


def init_ecapa_params(key, cfg: EcapaConfig):
    C, A = cfg.channels, cfg.cat_channels
    ks = jax.random.split(key, 64)
    ki = iter(ks)

    def conv(k_, kernel, cin, cout):
        # wespeaker convs are bias-free (BN follows)
        return {"w": jax.random.normal(k_, (kernel, cin, cout))
                * (kernel * cin) ** -0.5}

    def bn(ch):
        return {"g": jnp.ones((ch,)), "b": jnp.zeros((ch,)),
                "mean": jnp.zeros((ch,)), "var": jnp.ones((ch,))}

    def crb(kernel, cin, cout):
        return {"conv": conv(next(ki), kernel, cin, cout), "bn": bn(cout)}

    def block(kernel):
        w = C // cfg.scale
        S = cfg.se_bottleneck
        return {
            "in": crb(1, C, C),
            "res2": {"convs": [conv(next(ki), kernel, w, w)
                               for _ in range(cfg.scale - 1)],
                     "bns": [bn(w) for _ in range(cfg.scale - 1)]},
            "out": crb(1, C, C),
            "se": {"w1": jax.random.normal(next(ki), (C, S)) * C**-0.5,
                   "b1": jnp.zeros((S,)),
                   "w2": jax.random.normal(next(ki), (S, C)) * S**-0.5,
                   "b2": jnp.zeros((C,))},
        }

    return {
        "layer1": crb(5, cfg.feat_dim, C),
        "layer2": block(3),
        "layer3": block(3),
        "layer4": block(3),
        # the post-concat 1×1 conv keeps its bias (no BN follows)
        "conv": {**conv(next(ki), 1, A, A), "b": jnp.zeros((A,))},
        "attn1": {"w": jax.random.normal(next(ki), (3 * A, cfg.attn_hidden))
                  * (3 * A) ** -0.5, "b": jnp.zeros((cfg.attn_hidden,))},
        "attn2": {"w": jax.random.normal(next(ki), (cfg.attn_hidden, A))
                  * cfg.attn_hidden**-0.5, "b": jnp.zeros((A,))},
        "pool_bn": bn(2 * A),
        "linear": {"w": jax.random.normal(next(ki), (2 * A, cfg.embed_dim))
                   * (2 * A) ** -0.5, "b": jnp.zeros((cfg.embed_dim,))},
    }
