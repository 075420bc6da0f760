"""DAC (Descript Audio Codec), TPU-native.

First-party JAX implementation, weight-compatible with the
``descript/dac_{16,24,44}khz`` checkpoints. Replaces the reference's wrapper
around the descript package (reference ``audiocodecs/dac.py:30-131``).

Architecture (recovered from the public DAC checkpoints/paper):
  * Encoder: conv7 stem → per-stage [3 residual units (dilations 1/3/9 with
    snake activations) → snake → strided conv k=2s] with channel doubling →
    snake → conv3 projection to ``hidden_size``.
  * Quantizer: RVQ where each stage projects ``hidden → codebook_dim`` (1×1
    conv), does **L2-normalized (cosine) nearest-neighbor** search, then
    projects back ``codebook_dim → hidden``.
  * Decoder: conv7 → per-stage [snake → convT k=2s → 3 residual units] →
    snake → conv7 → tanh.

TPU notes: snake is elementwise VPU work that XLA fuses into the adjacent
convs; the cosine VQ search is one ``[B·N, D] @ [D, C]`` MXU matmul per stage.
All padding is symmetric and static.

API parity with the reference wrapper: ``num_codebooks`` selects the first K
stages (``dac.py:96-98``); ``latent`` flag flips ``embs()`` between raw
codebooks ``[K, C, D]`` and post-projection embeddings ``[K, C, H]``
(``dac.py:66-91``); feats are pre-projection encoder output (``dac.py:110-112``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from audiocodecs_tpu.codec import Codec, CodecConfig
from audiocodecs_tpu.nn.layers import conv1d, conv_transpose1d, pad1d, unit_norm

__all__ = ["DAC", "DACModelConfig"]


@dataclasses.dataclass(frozen=True)
class DACModelConfig:
    """Defaults = dac_16khz checkpoint."""

    sampling_rate: int = 16000
    encoder_hidden_size: int = 64
    downsampling_ratios: tuple[int, ...] = (2, 4, 5, 8)
    decoder_hidden_size: int = 1536
    upsampling_ratios: tuple[int, ...] = (8, 5, 4, 2)
    hidden_size: int = 1024
    n_codebooks: int = 12
    codebook_size: int = 1024
    codebook_dim: int = 8

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.downsampling_ratios:
            out *= r
        return out


# cos(2πr) on r ∈ [-½, ½] as an even minimax polynomial in t = r²
# (least-squares on 20k Chebyshev nodes; max |err| 1.1e-8 < f32 ulp).
_SNAKE_COS_POLY = (
    0.99999998905902143, -19.739204499453951, 64.939117459897673,
    -85.450139530911997, 60.167630951117602, -25.967599248888114,
    6.5286581616462076,
)


def _snake_sin2_poly(y: jax.Array) -> jax.Array:
    """``sin²(y)`` via range reduction + even polynomial (~11 VPU ops vs
    XLA's full ``sin`` lowering): sin²(y) = (1 − cos(2πr))/2 with
    r = y/π − round(y/π)."""
    u = y * (1.0 / math.pi)
    r = u - jnp.round(u)
    t = r * r
    cos2 = jnp.asarray(_SNAKE_COS_POLY[-1], y.dtype)
    for c in _SNAKE_COS_POLY[-2::-1]:
        cos2 = cos2 * t + jnp.asarray(c, y.dtype)
    return 0.5 - 0.5 * cos2


def _snake_approx_on() -> bool:
    """``ACX_SNAKE_APPROX=1`` swaps the decoder-side snake transcendental
    for the polynomial (DECODE ONLY — tokens come from the encoder, which
    always runs the exact ``jnp.sin``). Candidate for the batched-DAC
    stage-3/4 cost (BENCH_NOTES "decoder per-stage split"); default off
    until measured on chip."""
    import os

    from audiocodecs_tpu.nn import layers

    return (os.environ.get("ACX_SNAKE_APPROX", "0") == "1"
            and layers._CONV_ROLE == "decoder")


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation ``x + sin²(αx)/α`` (periodic inductive bias)."""
    if _snake_approx_on():
        return x + _snake_sin2_poly(alpha * x) / (alpha + 1e-9)
    return x + jnp.sin(alpha * x) ** 2 / (alpha + 1e-9)


def _conv(x, p, *, stride=1, dilation=1, pad=0):
    if pad:
        x = pad1d(x, pad, pad, mode="constant")
    return conv1d(x, p["w"], p["b"], stride=stride, dilation=dilation)


def _convtr(x, p, *, stride, pad):
    y = conv_transpose1d(x, p["w"], p["b"], stride=stride)
    return y[:, pad : y.shape[1] - pad] if pad else y


def _resunit_pallas_mode(x) -> str | None:
    """Fused decode-side residual unit (``ops/dac_resunit_pallas.py``),
    settable via ``ACX_PALLAS_DAC_RESUNIT=0/1/auto``.

    ``auto`` engages on TPU, DECODE side only (tokens can't depend on it,
    so DEFAULT 1-pass dots are fair game), f32 activations, C ≤ 256.
    Default OFF: measured NEUTRAL vs XLA at DEFAULT precision (117.4 vs
    116.0 ms DAC-44.1k batch-1 roundtrip) and slower at high/highest
    (Mosaic has no 3-pass dot) — BENCH_NOTES round 3. Kept as a tested
    experiment. Returns the kernel precision name, or None for XLA."""
    import os

    from audiocodecs_tpu.nn import layers

    v = os.environ.get("ACX_PALLAS_DAC_RESUNIT", "0")
    if v == "0":
        return None
    # Decode-side ALWAYS (the kernel is decode-only by design — encoder
    # residual units feed the argmin and must stay on the XLA path that
    # the parity oracles certify); "1" only drops auto's dtype/width
    # gates, e.g. to probe the bf16-activation throughput tier.
    if layers._CONV_ROLE != "decoder":
        return None
    enabled = v == "1" or (
        jax.default_backend() == "tpu"
        and x.dtype == jnp.float32
        and x.shape[-1] <= 256
    )
    if not enabled:
        return None
    # bf16 activations carry no extra mantissa for multi-pass dots, and
    # Mosaic rejects HIGHEST dots on bf16 lhs outright ("Bad lhs type",
    # BENCH_NOTES round 5) — the only valid kernel precision is DEFAULT.
    if x.dtype == jnp.bfloat16:
        return "default"
    if layers._CONV_ROLE == "decoder":
        name = os.environ.get("ACX_DEC_CONV_PRECISION", "").lower()
        if name:
            return name
    return {  # mirror conv_precision()'s env mapping
        "default": "default", "high": "high", "highest": "highest",
    }.get(os.environ.get("ACX_CONV_PRECISION", "highest").lower(),
          "highest")


def _residual_unit(x, p, dilation: int):
    mode = _resunit_pallas_mode(x)
    if mode is not None:
        from audiocodecs_tpu.ops.dac_resunit_pallas import (
            dac_resunit_pallas,
        )

        # kernel accumulates/writes f32; restore the ambient activation
        # dtype (bf16 under the decoder-bfloat16 tier) for the next conv
        return dac_resunit_pallas(
            x, p["conv1"]["w"], p["conv1"]["b"], p["alpha1"],
            p["conv2"]["w"], p["conv2"]["b"], p["alpha2"],
            dilation=dilation, precision_name=mode,
            snake_poly=_snake_approx_on()).astype(x.dtype)
    pad = ((7 - 1) * dilation) // 2
    h = snake(x, p["alpha1"])
    h = _conv(h, p["conv1"], dilation=dilation, pad=pad)
    h = snake(h, p["alpha2"])
    h = _conv(h, p["conv2"])
    trim = (x.shape[1] - h.shape[1]) // 2
    if trim > 0:
        x = x[:, trim:-trim]
    return x + h


def apply_dac_encoder(params, x: jax.Array, cfg: DACModelConfig) -> jax.Array:
    """``[B, T, 1]`` → ``[B, N, hidden]`` (pre-quantization features).

    Runs at ``act_dtype()`` (bf16 under ``ACX_ACT_DTYPE=bfloat16``) with an
    f32 re-cast at the output so the RVQ distance search stays exact."""
    import math

    from audiocodecs_tpu.nn.layers import act_dtype

    in_dtype = x.dtype
    dt = act_dtype("encoder")
    x = x.astype(dt)
    params = jax.tree.map(lambda a: a.astype(dt), params)
    h = _conv(x, params["conv_in"], pad=3)
    for bi, stride in enumerate(cfg.downsampling_ratios):
        b = params["blocks"][bi]
        for ri, dil in enumerate((1, 3, 9)):
            h = _residual_unit(h, b["res"][ri], dil)
        h = snake(h, b["alpha_down"])
        h = _conv(h, b["conv_down"], stride=stride, pad=math.ceil(stride / 2))
    h = snake(h, params["alpha_out"])
    return _conv(h, params["conv_out"], pad=1).astype(in_dtype)


def apply_dac_decoder(params, q: jax.Array, cfg: DACModelConfig) -> jax.Array:
    """``[B, N, hidden]`` → ``[B, T, 1]`` (at ``act_dtype()``, f32 out).

    Runs inside ``conv_role("decoder")`` so ``ACX_DEC_CONV_PRECISION``
    applies: decode precision cannot affect tokens, and HIGH decode
    measured faster than bf16 activations on v5e (BENCH_NOTES round 3)."""
    import math

    from audiocodecs_tpu.nn.layers import act_dtype, conv_role

    in_dtype = q.dtype
    dt = act_dtype("decoder")
    q = q.astype(dt)
    params = jax.tree.map(lambda a: a.astype(dt), params)
    with conv_role("decoder"):
        h = _conv(q, params["conv_in"], pad=3)
        for bi, stride in enumerate(cfg.upsampling_ratios):
            b = params["blocks"][bi]
            h = snake(h, b["alpha_up"])
            h = _convtr(h, b["convtr"], stride=stride,
                        pad=math.ceil(stride / 2))
            for ri, dil in enumerate((1, 3, 9)):
                h = _residual_unit(h, b["res"][ri], dil)
        h = snake(h, params["alpha_out"])
        h = _conv(h, params["conv_out"], pad=3)
    return jnp.tanh(h).astype(in_dtype)


def dac_rvq_encode(feats: jax.Array, quantizers: list, K: int) -> jax.Array:
    """Projected cosine-similarity RVQ → tokens ``[B, N, K]``.

    Stage scores are plain dot products of unit vectors (the HF/descript
    distance includes a ``+‖c‖²`` term that is constant after normalization).
    """
    residual = feats
    toks = []
    for k in range(K):
        q = quantizers[k]
        z = conv1d(residual, q["in_proj"]["w"], q["in_proj"]["b"])  # [B,N,D]
        zn = unit_norm(z)
        cb = unit_norm(q["codebook"])  # [C, D]
        idx = jnp.argmax(
            jnp.einsum("bnd,cd->bnc", zn, cb,
                       precision=jax.lax.Precision.HIGHEST),
            axis=-1,
        ).astype(jnp.int32)
        toks.append(idx)
        zq = jnp.take(q["codebook"], idx, axis=0)
        residual = residual - conv1d(zq, q["out_proj"]["w"], q["out_proj"]["b"])
    return jnp.stack(toks, axis=-1)


def dac_rvq_decode(toks: jax.Array, quantizers: list) -> jax.Array:
    """Tokens ``[B, N, K]`` → quantized features ``[B, N, hidden]``."""
    K = toks.shape[-1]
    out = None
    for k in range(K):
        q = quantizers[k]
        zq = jnp.take(q["codebook"], toks[..., k], axis=0)
        y = conv1d(zq, q["out_proj"]["w"], q["out_proj"]["b"])
        out = y if out is None else out + y
    return out


class DAC(Codec):
    @classmethod
    def default_model_config(cls, orig_sample_rate: int = 16000):
        """Per-rate architectures of the released descript checkpoints
        (reference selects by ``model_type={16,24,44}khz``, ``dac.py:55-57``)."""
        if orig_sample_rate >= 44000:
            return DACModelConfig(
                sampling_rate=orig_sample_rate,
                downsampling_ratios=(2, 4, 8, 8),  # hop 512 → 86 Hz
                upsampling_ratios=(8, 8, 4, 2),
                n_codebooks=9,
            )
        if orig_sample_rate >= 24000:
            return DACModelConfig(
                sampling_rate=orig_sample_rate,
                downsampling_ratios=(2, 4, 5, 8),  # hop 320 → 75 Hz
                upsampling_ratios=(8, 5, 4, 2),
                n_codebooks=32,
            )
        return DACModelConfig(sampling_rate=orig_sample_rate)  # 16 kHz, K=12

    def __init__(
        self,
        sample_rate: int,
        orig_sample_rate: int = 16000,
        mode: str = "reconstruct",
        num_codebooks: int = 8,
        latent: bool = False,
        model_config: Optional[DACModelConfig] = None,
        params=None,
        key: Optional[jax.Array] = None,
    ):
        self.model_config = model_config or self.default_model_config(
            orig_sample_rate
        )
        self.latent = latent
        cfg = CodecConfig(
            sample_rate=sample_rate,
            orig_sample_rate=orig_sample_rate,
            mode=mode,
            num_codebooks=num_codebooks,
            vocab_size=self.model_config.codebook_size,
        )
        if params is None:
            params = init_dac_params(
                key if key is not None else jax.random.PRNGKey(0), self.model_config
            )
        if mode == "encode":
            params = {k: v for k, v in params.items() if k != "decoder"}
        elif mode == "decode":
            params = {k: v for k, v in params.items() if k != "encoder"}
        super().__init__(cfg, params)

    def _encode_feats(self, params, sig, length):
        del length
        return apply_dac_encoder(params["encoder"], sig[:, :, None],
                                 self.model_config)

    def _sig_to_feats(self, params, sig, length):
        feats = self._encode_feats(params, sig, length)
        if self.latent:
            q0 = params["quantizer"][0]
            feats = conv1d(feats, q0["in_proj"]["w"], q0["in_proj"]["b"])
        return feats

    def _sig_to_toks(self, params, sig, length):
        feats = self._encode_feats(params, sig, length)
        return dac_rvq_encode(feats, params["quantizer"],
                              self.config.num_codebooks)

    def _sig_to_qfeats(self, params, sig, length):
        toks = self._sig_to_toks(params, sig, length)
        return dac_rvq_decode(toks, params["quantizer"])

    def _toks_to_qfeats(self, params, toks, length):
        return dac_rvq_decode(toks, params["quantizer"])

    def _toks_to_sig(self, params, toks, length):
        q = dac_rvq_decode(toks, params["quantizer"])
        return apply_dac_decoder(params["decoder"], q, self.model_config)[:, :, 0]

    def _feats_to_sig(self, params, feats, length):
        return apply_dac_decoder(params["decoder"], feats, self.model_config)[:, :, 0]

    def embs(self) -> jax.Array:
        """``[K, C, D]`` raw (latent) or ``[K, C, H]`` post-projection
        codebooks (reference ``dac.py:66-91``)."""
        K = self.config.num_codebooks
        qs = self.params["quantizer"][:K]
        if self.latent:
            return jnp.stack([q["codebook"] for q in qs])
        embs = []
        for q in qs:
            e = conv1d(q["codebook"][None], q["out_proj"]["w"],
                       q["out_proj"]["b"])[0]
            embs.append(e)
        return jnp.stack(embs)


def init_dac_params(key, cfg: DACModelConfig):
    import numpy as np

    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))

    def conv(cin, cout, k):
        s = 0.02
        return {
            "w": jnp.asarray(rng.standard_normal((k, cin, cout)) * s, jnp.float32),
            "b": jnp.zeros((cout,), jnp.float32),
        }

    def res_unit(ch):
        return {
            "alpha1": jnp.ones((ch,), jnp.float32),
            "conv1": conv(ch, ch, 7),
            "alpha2": jnp.ones((ch,), jnp.float32),
            "conv2": conv(ch, ch, 1),
        }

    enc_blocks = []
    ch = cfg.encoder_hidden_size
    for i, stride in enumerate(cfg.downsampling_ratios):
        dim = cfg.encoder_hidden_size * 2 ** (i + 1)
        enc_blocks.append(
            {
                "res": [res_unit(dim // 2) for _ in range(3)],
                "alpha_down": jnp.ones((dim // 2,), jnp.float32),
                "conv_down": conv(dim // 2, dim, 2 * stride),
            }
        )
        ch = dim
    encoder = {
        "conv_in": conv(1, cfg.encoder_hidden_size, 7),
        "blocks": enc_blocks,
        "alpha_out": jnp.ones((ch,), jnp.float32),
        "conv_out": conv(ch, cfg.hidden_size, 3),
    }

    dec_blocks = []
    for i, stride in enumerate(cfg.upsampling_ratios):
        cin = cfg.decoder_hidden_size // 2**i
        cout = cfg.decoder_hidden_size // 2 ** (i + 1)
        dec_blocks.append(
            {
                "alpha_up": jnp.ones((cin,), jnp.float32),
                "convtr": conv(cin, cout, 2 * stride),
                "res": [res_unit(cout) for _ in range(3)],
            }
        )
    out_dim = cfg.decoder_hidden_size // 2 ** len(cfg.upsampling_ratios)
    decoder = {
        "conv_in": conv(cfg.hidden_size, cfg.decoder_hidden_size, 7),
        "blocks": dec_blocks,
        "alpha_out": jnp.ones((out_dim,), jnp.float32),
        "conv_out": conv(out_dim, 1, 7),
    }

    quantizer = [
        {
            "in_proj": conv(cfg.hidden_size, cfg.codebook_dim, 1),
            "out_proj": conv(cfg.codebook_dim, cfg.hidden_size, 1),
            "codebook": jnp.asarray(
                rng.standard_normal((cfg.codebook_size, cfg.codebook_dim)) * 0.02,
                jnp.float32,
            ),
        }
        for _ in range(cfg.n_codebooks)
    ]
    return {"encoder": encoder, "decoder": decoder, "quantizer": quantizer}
