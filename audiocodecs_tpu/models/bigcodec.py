"""BigCodec, TPU-native (true vendor architecture).

BigCodec (Xin et al., 2024; ``Alethia/BigCodec`` checkpoint, reference
wrapper ``audiocodecs/bigcodec.py:30-159``) is a DAC-lineage design:
snake-activated residual units with strided downsampling (hop
2·2·2·5·5 = 200 → 80 Hz tokens at 16 kHz), a 2-layer LSTM bottleneck in the
encoder, and ONE factorized, L2-normalized VQ (8192 × 8-d codebook behind
1024↔8 projections — 1.04 kbps). Decoder mirrors with transposed convs.

The reference loads the vendor checkpoint as two state dicts
(``checkpoint["CodecEnc"]`` / ``checkpoint["generator"]`` with the
quantizer inside the generator, ``bigcodec.py:61-68``);
:mod:`audiocodecs_tpu.convert.zoo` maps both. ``latent`` flips ``embs()``
between the raw 8-d codebook and its ``out_proj`` image
(``bigcodec.py:76-85``).

TPU notes: snake fuses into adjacent convs on the VPU; the single VQ search
is one ``[B·N, 8] @ [8, 8192]`` MXU matmul; the LSTM islands run f32 (see
``nn/seanet`` notes) via :func:`audiocodecs_tpu.nn.lstm.lstm`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.models.dac import _conv, _residual_unit, snake
from audiocodecs_tpu.nn.layers import act_dtype, conv_role, unit_norm
from audiocodecs_tpu.nn.lstm import init_lstm_params, lstm

__all__ = ["BigCodec", "BigCodecModelConfig"]


@dataclasses.dataclass(frozen=True)
class BigCodecModelConfig:
    sampling_rate: int = 16000
    ngf: int = 48
    up_ratios: tuple[int, ...] = (2, 2, 2, 5, 5)  # hop 200 → 80 Hz
    dilations: tuple[int, ...] = (1, 3, 9)
    hidden_size: int = 1024  # encoder output / decoder input
    codebook_size: int = 8192
    codebook_dim: int = 8
    rnn_layers: int = 2

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.up_ratios:
            out *= r
        return out

    @property
    def enc_width(self) -> int:
        return self.ngf * (2 ** len(self.up_ratios))


def apply_codec_encoder(params, sig, cfg: "BigCodecModelConfig"):
    """The BigCodec-lineage ``CodecEncoder``: snake residual units with
    strided downsampling, residual LSTM bottleneck, snake + conv head.

    ``sig`` [B, T] → [B, T/hop, hidden]. Shared verbatim by XCodec2's
    ``CodecEnc`` (reference ``audiocodecs/xcodec2.py:61``, hop 320) — the
    vendor copied BigCodec's encoder wholesale.
    """
    dt = act_dtype("encoder")
    x = sig[:, :, None].astype(dt)
    pc = jax.tree.map(lambda a: a.astype(dt), params)
    h = _conv(x, pc["stem"], pad=3)
    for bi, stride in enumerate(cfg.up_ratios):
        b = pc["blocks"][bi]
        for ri, dil in enumerate(cfg.dilations):
            h = _residual_unit(h, b["res"][ri], dil)
        h = snake(h, b["alpha_down"])
        h = _conv(h, b["conv_down"], stride=stride,
                  pad=-(-stride // 2))  # ceil(s/2), DAC-style k=2s
    # 2-layer LSTM bottleneck with residual connection (f32 island)
    hf = h.astype(jnp.float32)
    y, _ = lstm(hf, params["rnn"])
    h = hf + y
    h = snake(h, params["alpha_out"].astype(jnp.float32))
    return _conv(h, jax.tree.map(lambda a: a.astype(jnp.float32),
                                 params["conv_out"]), pad=1)


def init_codec_encoder_params(key, cfg: "BigCodecModelConfig"):
    """Init for :func:`apply_codec_encoder` (BigCodec/XCodec2 encoder)."""
    ks = jax.random.split(key, 4)

    def conv(k, kernel, cin, cout):
        return {"w": jax.random.normal(k, (kernel, cin, cout))
                * (kernel * cin) ** -0.5, "b": jnp.zeros((cout,))}

    def ru(k, ch):
        k1, k2 = jax.random.split(k)
        return {"alpha1": jnp.ones((1, 1, ch)), "conv1": conv(k1, 7, ch, ch),
                "alpha2": jnp.ones((1, 1, ch)), "conv2": conv(k2, 1, ch, ch)}

    blocks = []
    d = cfg.ngf
    for i, stride in enumerate(cfg.up_ratios):
        kk = jax.random.split(jax.random.fold_in(ks[1], i), 4)
        blocks.append({
            "res": [ru(kk[j], d) for j in range(len(cfg.dilations))],
            "alpha_down": jnp.ones((1, 1, d)),
            "conv_down": conv(kk[3], 2 * stride, d, d * 2),
        })
        d *= 2
    W = cfg.enc_width
    return {
        "stem": conv(ks[0], 7, 1, cfg.ngf),
        "blocks": blocks,
        "rnn": init_lstm_params(ks[2], cfg.rnn_layers, W, W),
        "alpha_out": jnp.ones((1, 1, W)),
        "conv_out": conv(ks[3], 3, W, cfg.hidden_size),
    }


class BigCodec(Codec):
    DEFAULT_ORIG_SR = 16000

    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        return BigCodecModelConfig(sampling_rate=orig_sample_rate)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: int = 1,
        latent: bool = True,
        model_config: Optional[BigCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        if num_codebooks != 1:
            raise ValueError("BigCodec is single-codebook (K=1)")
        self.model_config = model_config or BigCodecModelConfig(
            sampling_rate=orig_sample_rate
        )
        self.latent = latent
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=1,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_bigcodec_params(
                key if key is not None else jax.random.PRNGKey(0),
                self.model_config,
            )
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    # ----------------------------- encoder ---------------------------- #

    def _encode_z(self, params, sig):
        return apply_codec_encoder(params["encoder"], sig, self.model_config)

    def _quantize(self, params, z):
        q = params["quantizer"]
        e = jnp.einsum("bnh,hd->bnd", z, q["in_proj"]["w"]) + q["in_proj"]["b"]
        e = unit_norm(e)
        cb = unit_norm(q["codebook"])  # cosine search like DAC/FVQ
        scores = jnp.einsum("bnd,cd->bnc", e, cb)
        return jnp.argmax(scores, axis=-1).astype(jnp.int32)

    def _dequantize(self, params, idx):
        q = params["quantizer"]
        v = jnp.take(q["codebook"], idx, axis=0)
        return jnp.einsum("bnd,dh->bnh", v, q["out_proj"]["w"]) + (
            q["out_proj"]["b"])

    def _sig_to_toks(self, params, sig, length):
        z = self._encode_z(params, sig)
        return self._quantize(params, z)[..., None]  # [B, N, K=1]

    def _sig_to_feats(self, params, sig, length):
        if self.latent:
            z = self._encode_z(params, sig)
            q = params["quantizer"]
            e = jnp.einsum("bnh,hd->bnd", z, q["in_proj"]["w"]) + (
                q["in_proj"]["b"])
            return e
        return self._encode_z(params, sig)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return self._dequantize(params, toks[..., 0])

    def _toks_to_qfeats(self, params, toks, length):
        return self._dequantize(params, toks[..., 0])

    def _decode_z(self, params, z):
        with conv_role("decoder"):
            return self._decode_z_inner(params, z)

    def _decode_z_inner(self, params, z):
        mc = self.model_config
        p = params["decoder"]
        dt = act_dtype("decoder")
        pc = jax.tree.map(lambda a: a.astype(dt), p)
        h = _conv(z.astype(dt), pc["stem"], pad=3)
        if "rnn" in p:  # LSTM bottleneck mirrors the encoder's (f32 island)
            # decode-side LSTM: past the quantizer, so the wide Pallas
            # recurrence (ACX_PALLAS_LSTM_WIDE=decoder) is token-safe here
            hf = h.astype(jnp.float32)
            y, _ = lstm(hf, p["rnn"])
            h = (hf + y).astype(dt)
        for bi, stride in enumerate(reversed(mc.up_ratios)):
            b = pc["blocks"][bi]
            h = snake(h, b["alpha_up"])
            # k=2s transposed conv, pad=ceil(s/2), output_padding=s%2
            # (torch semantics) → exactly N·s output frames for odd strides
            from audiocodecs_tpu.nn.layers import conv_transpose1d

            y = conv_transpose1d(h, b["convtr"]["w"], b["convtr"]["b"],
                                 stride=stride)
            left = -(-stride // 2)
            right = left - (stride % 2)
            h = y[:, left : y.shape[1] - right]
            for ri, dil in enumerate(mc.dilations):
                h = _residual_unit(h, b["res"][ri], dil)
        h = snake(h, pc["alpha_out"])
        h = _conv(h, pc["conv_out"], pad=3)
        return jnp.tanh(h)[:, :, 0].astype(jnp.float32)

    def _toks_to_sig(self, params, toks, length):
        return self._decode_z(params, self._dequantize(params, toks[..., 0]))

    def _feats_to_sig(self, params, feats, length):
        return self._decode_z(params, feats)

    def embs(self) -> jax.Array:
        q = self.params["quantizer"]
        if self.latent:
            return q["codebook"][None]  # [1, C, 8]
        v = jnp.einsum("cd,dh->ch", q["codebook"], q["out_proj"]["w"]) + (
            q["out_proj"]["b"])
        return v[None]  # [1, C, 1024]


def init_bigcodec_params(key, cfg: BigCodecModelConfig):
    ks = jax.random.split(key, 16)

    def conv(k, kernel, cin, cout):
        return {"w": jax.random.normal(k, (kernel, cin, cout))
                * (kernel * cin) ** -0.5, "b": jnp.zeros((cout,))}

    def ru(k, ch):
        k1, k2 = jax.random.split(k)
        return {"alpha1": jnp.ones((1, 1, ch)), "conv1": conv(k1, 7, ch, ch),
                "alpha2": jnp.ones((1, 1, ch)), "conv2": conv(k2, 1, ch, ch)}

    def dec_blocks(k):
        blocks = []
        d = cfg.enc_width
        for i, stride in enumerate(reversed(cfg.up_ratios)):
            kk = jax.random.split(jax.random.fold_in(k, i), 4)
            blocks.append({
                "alpha_up": jnp.ones((1, 1, d)),
                "convtr": conv(kk[3], 2 * stride, d, d // 2),
                "res": [ru(kk[j], d // 2) for j in range(len(cfg.dilations))],
            })
            d //= 2
        return blocks

    H, W = cfg.hidden_size, cfg.enc_width
    return {
        "encoder": init_codec_encoder_params(ks[0], cfg),
        "quantizer": {
            "in_proj": {"w": jax.random.normal(ks[4], (H, cfg.codebook_dim))
                        * H**-0.5, "b": jnp.zeros((cfg.codebook_dim,))},
            "codebook": jax.random.normal(ks[5], (cfg.codebook_size,
                                                  cfg.codebook_dim)),
            "out_proj": {"w": jax.random.normal(ks[6], (cfg.codebook_dim, H))
                         * cfg.codebook_dim**-0.5, "b": jnp.zeros((H,))},
        },
        "decoder": {
            "stem": conv(ks[7], 7, H, W),
            "rnn": init_lstm_params(ks[10], cfg.rnn_layers, W, W),
            "blocks": dec_blocks(ks[8]),
            "alpha_out": jnp.ones((1, 1, cfg.ngf)),
            "conv_out": conv(ks[9], 7, cfg.ngf, 1),
        },
    }
