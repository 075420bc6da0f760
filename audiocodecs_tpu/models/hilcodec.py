"""HILCodec (variance-constrained lightweight streaming codec), TPU-native.

Replaces the reference's wrapper around the HILCodec vendor package
(reference ``audiocodecs/hilcodec.py:30-150``: ``hilcodec_{speech,music}``
checkpoints @ 24 kHz, ``quantizer(feats, n=num_codebooks)`` at ``:76``,
per-layer codebooks read as ``quantizer.layers[k].embed`` at ``:68-73``,
``vocab_size = 1024``).

Architecture reconstructed from the paper (arXiv:2405.04752 "HILCodec:
High-Fidelity and Lightweight Neural Audio Codec") — the vendor source is
not available in this environment, so per-element confidence is recorded:

* HIGH (paper/reference-pinned): fully causal streaming conv towers,
  strides (2, 4, 5, 8) = hop 320 → 75 Hz @ 24 kHz; residual VQ with
  8 × 1024 codebooks; per-layer ``embed`` codebook naming.
* MEDIUM (paper-described, exact form assumed): the *variance-constrained
  design* — each residual connection is scaled so activation variance
  stays bounded through depth (implemented as ``(x + f(x)) / √2``), and
  the lightweight residual unit uses a depthwise k-conv followed by a
  pointwise 1×1 (MobileNet-style separable conv).
* MEDIUM (paper figure, Wave-U-Net-like): multi-scale *waveform skips* —
  each encoder block additionally receives the input waveform average-
  pooled to its rate through a 1×1 projection; each decoder block emits a
  1-channel waveform head, upsampled (nearest) and summed into the output.
* ASSUMED (to be diffed against a real checkpoint,
  ``tools/inspect_checkpoint.py --family hilcodec``): base width 32
  doubling per stage (cap 512), 2 residual units per block with dilations
  (1, 3), kernel 7 stem/res, k = 2·stride down/up convs, ELU activations,
  128-d embedding.

Streaming: every conv is causal with constant left context, and the
waveform-skip pooling is non-overlapping (window = cumulative stride), so
chunked encoding with carried per-conv state is bit-exact vs batch when
chunks are whole frames (``encode_chunk``; validated in
``tests/test_streaming.py``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import conv1d, conv_role, conv_transpose1d
from audiocodecs_tpu.quant.rvq import rvq_decode, rvq_encode

__all__ = ["HILCodec", "HILCodecModelConfig", "init_hilcodec_params"]

_INV_SQRT2 = 0.7071067811865476


@dataclasses.dataclass(frozen=True)
class HILCodecModelConfig:
    sampling_rate: int = 24000
    channels: int = 32
    max_channels: int = 512
    strides: tuple[int, ...] = (2, 4, 5, 8)  # hop 320 → 75 Hz
    kernel_size: int = 7
    res_kernel_size: int = 7
    res_units_per_block: int = 2
    res_dilations: tuple[int, ...] = (1, 3)
    emb_dim: int = 128
    codebook_size: int = 1024
    num_quantizers: int = 8
    waveform_skips: bool = True
    depthwise: bool = True
    var_constrained: bool = True

    @property
    def hop_length(self) -> int:
        out = 1
        for s in self.strides:
            out *= s
        return out

    @property
    def widths(self) -> tuple[int, ...]:
        """Channel width at the INPUT of each block (after the stem)."""
        out, c = [], self.channels
        for _ in self.strides:
            out.append(c)
            c = min(2 * c, self.max_channels)
        return tuple(out)


def _cconv(x, p, stride: int = 1, dilation: int = 1, groups: int = 1):
    """Causal conv: constant left pad (k−1)·d − (s−1), VALID."""
    k = p["w"].shape[0]
    pad = (k - 1) * dilation - (stride - 1)
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
    return conv1d(x, p["w"], p.get("b"), stride=stride, dilation=dilation,
                  groups=groups)


def _cconvtr(x, p, stride: int):
    """Causal transposed conv: keep the first T·s outputs."""
    y = conv_transpose1d(x, p["w"], p.get("b"), stride=stride)
    return y[:, : x.shape[1] * stride]


def _res_unit(x, p, cfg: HILCodecModelConfig, dilation: int):
    h = jax.nn.elu(x)
    h = _cconv(h, p["dw"], dilation=dilation,
               groups=x.shape[-1] if cfg.depthwise else 1)
    h = jax.nn.elu(h)
    h = conv1d(h, p["pw"]["w"], p["pw"].get("b"))
    y = x + h
    return y * _INV_SQRT2 if cfg.var_constrained else y


def _pool_wave(sig, rate: int):
    """Non-overlapping mean pool of the waveform to 1/rate (causal by
    construction: window i covers samples [i·rate, (i+1)·rate))."""
    B, T = sig.shape[0], sig.shape[1]
    n = T // rate
    return jnp.mean(sig[:, : n * rate].reshape(B, n, rate), axis=2,
                    keepdims=False)[..., None]  # [B, n, 1]


def apply_hilcodec_encoder(params, sig, cfg: HILCodecModelConfig):
    """``[B, T]`` → ``[B, N, emb_dim]``."""
    x = _cconv(sig[:, :, None], params["stem"])
    rate = 1
    for bi, stride in enumerate(cfg.strides):
        b = params["blocks"][bi]
        if cfg.waveform_skips:
            w = _pool_wave(sig, rate)
            x = x + conv1d(w[:, : x.shape[1]], b["skip"]["w"],
                           b["skip"].get("b"))
        for ri, dil in enumerate(
                list(cfg.res_dilations)[: cfg.res_units_per_block]):
            x = _res_unit(x, b["res"][ri], cfg, dil)
        x = _cconv(jax.nn.elu(x), b["down"], stride=stride)
        rate *= stride
    return _cconv(jax.nn.elu(x), params["head"])


def apply_hilcodec_decoder(params, q, cfg: HILCodecModelConfig):
    """``[B, N, emb_dim]`` → ``[B, N·hop]`` (multi-scale head sum)."""
    with conv_role("decoder"):
        x = _cconv(q, params["stem"])
        rate = cfg.hop_length
        out = None
        for bi, stride in enumerate(reversed(cfg.strides)):
            b = params["blocks"][bi]
            x = _cconvtr(jax.nn.elu(x), b["up"], stride)
            rate //= stride
            for ri, dil in enumerate(
                    list(cfg.res_dilations)[: cfg.res_units_per_block]):
                x = _res_unit(x, b["res"][ri], cfg, dil)
            if cfg.waveform_skips:
                w = conv1d(x, b["skip"]["w"], b["skip"].get("b"))  # [B,n,1]
                w = jnp.repeat(w, rate, axis=1)
                out = w if out is None else out[:, : w.shape[1]] + w
        y = _cconv(jax.nn.elu(x), params["head"])
        if out is not None:
            y = y + out[:, : y.shape[1]]
    return y[:, :, 0]


class HILCodec(Codec):
    DEFAULT_ORIG_SR = 24000

    @classmethod
    def default_model_config(cls, orig_sample_rate: Optional[int] = None):
        return HILCodecModelConfig(
            sampling_rate=orig_sample_rate or cls.DEFAULT_ORIG_SR)

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: Optional[int] = None,
        mode: str = "reconstruct",
        num_codebooks: int = 8,
        model_config: Optional[HILCodecModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        orig_sample_rate = orig_sample_rate or self.DEFAULT_ORIG_SR
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate)
        mc = self.model_config
        if num_codebooks > mc.num_quantizers:
            raise ValueError(
                f"num_codebooks {num_codebooks} > {mc.num_quantizers}")
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=mc.codebook_size,
        )
        if params is None:
            params = init_hilcodec_params(
                key if key is not None else jax.random.PRNGKey(0), mc)
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    @property
    def frame_size(self) -> int:
        return self.model_config.hop_length

    # ----------------------------- encode ----------------------------- #

    def _sig_to_feats(self, params, sig, length):
        del length
        return apply_hilcodec_encoder(params["encoder"], sig,
                                      self.model_config)

    def _sig_to_toks(self, params, sig, length):
        z = apply_hilcodec_encoder(params["encoder"], sig,
                                   self.model_config)
        return rvq_encode(z, params["codebooks"],
                          self.config.num_codebooks)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return rvq_decode(toks, params["codebooks"])

    def _toks_to_qfeats(self, params, toks, length):
        return rvq_decode(toks, params["codebooks"])

    # ----------------------------- decode ----------------------------- #

    def _toks_to_sig(self, params, toks, length):
        q = rvq_decode(toks, params["codebooks"])
        return apply_hilcodec_decoder(params["decoder"], q,
                                      self.model_config)

    def _feats_to_sig(self, params, feats, length):
        return apply_hilcodec_decoder(params["decoder"], feats,
                                      self.model_config)

    def embs(self) -> jax.Array:
        """``[K, C, emb_dim]`` (reference stacks ``layer.embed``,
        ``hilcodec.py:68-73``)."""
        return self.params["codebooks"][: self.config.num_codebooks]

    # ---------------------- chunked streaming -------------------------- #
    # Every conv is causal constant-pad and the skip pooling is
    # non-overlapping, so carrying each conv's left context makes chunked
    # encoding bit-exact vs batch for whole-frame chunks.

    def init_streaming_state(self, batch: int):
        mc = self.model_config
        enc = self.params["encoder"]
        state = {"stem": jnp.zeros(
            (batch, enc["stem"]["w"].shape[0] - 1, 1))}
        widths = mc.widths
        for bi, stride in enumerate(mc.strides):
            b = enc["blocks"][bi]
            ch = widths[bi]
            for ri, dil in enumerate(
                    list(mc.res_dilations)[: mc.res_units_per_block]):
                k = b["res"][ri]["dw"]["w"].shape[0]
                state[f"b{bi}r{ri}"] = jnp.zeros(
                    (batch, (k - 1) * dil, ch))
            k = b["down"]["w"].shape[0]
            state[f"b{bi}d"] = jnp.zeros((batch, k - stride, ch))
        k = enc["head"]["w"].shape[0]
        state["head"] = jnp.zeros(
            (batch, k - 1, min(2 * widths[-1], mc.max_channels)))
        return state

    def encode_chunk(self, sig, state):
        """``sig`` [B, n·hop] → (tokens [B, n, K], new state)."""
        mc = self.model_config
        params = self.params
        enc = params["encoder"]
        new = {}

        def carried(x, p, key, stride=1, dilation=1, groups=1):
            buf = state[key]
            xin = jnp.concatenate([buf, x], axis=1)
            keep = buf.shape[1]
            new[key] = xin[:, xin.shape[1] - keep:] if keep else buf
            return conv1d(xin, p["w"], p.get("b"), stride=stride,
                          dilation=dilation, groups=groups)

        x = carried(sig[:, :, None], enc["stem"], "stem")
        rate = 1
        for bi, stride in enumerate(mc.strides):
            b = enc["blocks"][bi]
            if mc.waveform_skips:
                w = _pool_wave(sig, rate)
                x = x + conv1d(w[:, : x.shape[1]], b["skip"]["w"],
                               b["skip"].get("b"))
            for ri, dil in enumerate(
                    list(mc.res_dilations)[: mc.res_units_per_block]):
                p = b["res"][ri]
                h = jax.nn.elu(x)
                ch = x.shape[-1]
                h = carried(h, p["dw"], f"b{bi}r{ri}", dilation=dil,
                            groups=ch if mc.depthwise else 1)
                h = jax.nn.elu(h)
                h = conv1d(h, p["pw"]["w"], p["pw"].get("b"))
                x = x + h
                if mc.var_constrained:
                    x = x * _INV_SQRT2
            x = carried(jax.nn.elu(x), b["down"], f"b{bi}d", stride=stride)
            rate *= stride
        z = carried(jax.nn.elu(x), enc["head"], "head")
        toks = rvq_encode(z, params["codebooks"], self.config.num_codebooks)
        return toks, new


def init_hilcodec_params(key, cfg: HILCodecModelConfig):
    ks = jax.random.split(key, 8)

    def conv(k, kernel, cin, cout, groups: int = 1):
        fan = kernel * cin // groups
        return {"w": jax.random.normal(k, (kernel, cin // groups, cout))
                * fan**-0.5, "b": jnp.zeros((cout,))}

    def ru(k, ch):
        k1, k2 = jax.random.split(k)
        if cfg.depthwise:
            # depthwise [K, 1, ch] + pointwise [1, ch, ch]
            return {"dw": conv(k1, cfg.res_kernel_size, ch, ch, groups=ch),
                    "pw": conv(k2, 1, ch, ch)}
        return {"dw": conv(k1, cfg.res_kernel_size, ch, ch),
                "pw": conv(k2, 1, ch, ch)}

    widths = cfg.widths
    nu = cfg.res_units_per_block
    enc_blocks = []
    ch = cfg.channels
    for i, stride in enumerate(cfg.strides):
        kk = jax.random.split(jax.random.fold_in(ks[1], i), nu + 2)
        out = min(2 * widths[i], cfg.max_channels)
        blk = {"res": [ru(kk[j], widths[i]) for j in range(nu)],
               "down": conv(kk[nu], 2 * stride, widths[i], out)}
        if cfg.waveform_skips:
            blk["skip"] = conv(kk[nu + 1], 1, 1, widths[i])
        enc_blocks.append(blk)
        ch = out
    encoder = {
        "stem": conv(ks[0], cfg.kernel_size, 1, cfg.channels),
        "blocks": enc_blocks,
        "head": conv(ks[2], 3, ch, cfg.emb_dim),
    }
    dec_blocks = []
    ch = min(2 * widths[-1], cfg.max_channels)
    rev_widths = tuple(reversed(widths))
    for i, stride in enumerate(reversed(cfg.strides)):
        kk = jax.random.split(jax.random.fold_in(ks[4], i), nu + 2)
        out = rev_widths[i]
        blk = {"up": conv(kk[nu], 2 * stride, ch, out),
               "res": [ru(kk[j], out) for j in range(nu)]}
        if cfg.waveform_skips:
            blk["skip"] = conv(kk[nu + 1], 1, out, 1)
        dec_blocks.append(blk)
        ch = out
    decoder = {
        "stem": conv(ks[3], 3, cfg.emb_dim,
                     min(2 * widths[-1], cfg.max_channels)),
        "blocks": dec_blocks,
        "head": conv(ks[5], cfg.kernel_size, ch, 1),
    }
    codebooks = (jax.random.normal(
        ks[6], (cfg.num_quantizers, cfg.codebook_size, cfg.emb_dim))
        * cfg.emb_dim**-0.5)
    return {"encoder": encoder, "decoder": decoder, "codebooks": codebooks}
