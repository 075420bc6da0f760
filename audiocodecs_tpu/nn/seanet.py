"""SEANet-style convolutional encoder/decoder stacks (EnCodec family).

The backbone shared (with variations) by EnCodec, SpeechTokenizer, Mimi's
conv frontend, PAST, AudioDec and HILCodec in the reference zoo: a stem conv,
per-stage residual blocks + strided down/up-sampling convs with channel
doubling/halving, an optional LSTM bottleneck, and a final projection
(behavioral spec from the reference's EnCodec wrapper, reference
``audiocodecs/encodec.py`` + its HF backbone).

TPU design: channel-last ``[B, T, C]`` throughout; the whole stack is one
jitted graph of ``lax.conv_general_dilated`` calls with static padding
(computed at trace time), so XLA fuses the ELU/residual elementwise work into
the convs. The layer *plan* is data (a list of layer specs): the same plan
drives parameter init, forward application, and PyTorch checkpoint
conversion, which keeps all three in lockstep.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import causal_conv1d, conv_transpose1d, elu, pad1d
from audiocodecs_tpu.nn.lstm import init_lstm_params, lstm

__all__ = ["SEANetConfig", "seanet_encoder_plan", "seanet_decoder_plan",
           "apply_encoder", "apply_decoder", "init_seanet_params"]


@dataclasses.dataclass(frozen=True)
class SEANetConfig:
    audio_channels: int = 1
    num_filters: int = 32
    hidden_size: int = 128
    ratios: tuple[int, ...] = (8, 5, 4, 2)  # decoder order (upsampling)
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_growth_rate: int = 2
    num_residual_layers: int = 1
    compress: int = 2
    num_lstm_layers: int = 2
    causal: bool = True
    pad_mode: str = "reflect"
    use_conv_shortcut: bool = True
    trim_right_ratio: float = 1.0
    disable_last_norm: bool = False  # reserved for variants
    # SpeechTokenizer-style bidirectional encoder LSTM: output doubles to 2H
    # and the residual skip duplicates the input (y + cat(x, x)).
    lstm_bidirectional: bool = False

    @property
    def hop_length(self) -> int:
        out = 1
        for r in self.ratios:
            out *= r
        return out


# ----------------------------------------------------------------------- #
# Layer plans — specs are (kind, layer_index, meta...) in execution order.
# layer_index mirrors the upstream checkpoint's sequential numbering so the
# converter writes params[str(layer_index)] directly.
# ----------------------------------------------------------------------- #


def seanet_encoder_plan(cfg: SEANetConfig):
    plan, i = [], 0
    plan.append(("conv", i, cfg.audio_channels, cfg.num_filters, cfg.kernel_size, 1, 1))
    i += 1
    scale = 1
    for ratio in reversed(cfg.ratios):
        ch = scale * cfg.num_filters
        for j in range(cfg.num_residual_layers):
            plan.append(("resnet", i, ch, (cfg.dilation_growth_rate**j, 1)))
            i += 1
        plan.append(("elu", i)); i += 1
        plan.append(("conv", i, ch, ch * 2, ratio * 2, ratio, 1)); i += 1
        scale *= 2
    last_in = scale * cfg.num_filters
    if cfg.num_lstm_layers > 0:
        if cfg.lstm_bidirectional:
            plan.append(("bilstm", i, last_in)); i += 1
            last_in *= 2
        else:
            plan.append(("lstm", i, last_in)); i += 1
    plan.append(("elu", i)); i += 1
    plan.append(("conv", i, last_in, cfg.hidden_size,
                 cfg.last_kernel_size, 1, 1)); i += 1
    return plan


def seanet_decoder_plan(cfg: SEANetConfig):
    plan, i = [], 0
    scale = 2 ** len(cfg.ratios)
    plan.append(("conv", i, cfg.hidden_size, scale * cfg.num_filters,
                 cfg.kernel_size, 1, 1)); i += 1
    if cfg.num_lstm_layers > 0:
        plan.append(("lstm", i, scale * cfg.num_filters)); i += 1
    for ratio in cfg.ratios:
        ch = scale * cfg.num_filters
        plan.append(("elu", i)); i += 1
        plan.append(("convtr", i, ch, ch // 2, ratio * 2, ratio)); i += 1
        for j in range(cfg.num_residual_layers):
            plan.append(("resnet", i, ch // 2, (cfg.dilation_growth_rate**j, 1)))
            i += 1
        scale //= 2
    plan.append(("elu", i)); i += 1
    plan.append(("conv", i, cfg.num_filters, cfg.audio_channels,
                 cfg.last_kernel_size, 1, 1)); i += 1
    return plan


# ----------------------------------------------------------------------- #
# Forward application
# ----------------------------------------------------------------------- #


def _resblock_pallas_eligible(p, cfg: SEANetConfig, dilations) -> bool:
    """Fused-kernel dispatch (``ACX_PALLAS_RESBLOCK=1`` to enable).

    The fused kernel is bit-correct (100% token match on TPU) but currently
    SLOWER than XLA's conv path at EnCodec's small channel counts (the
    128-lane padding wastes most of each tiny matmul and per-tile grid
    overhead dominates) — measured 705× vs 1303× aggregate RTF. Kept as an
    opt-in experiment; the profitable Pallas kernel for this model is the
    fused LSTM (``ops/lstm_pallas.py``).
    """
    import os

    if os.environ.get("ACX_PALLAS_RESBLOCK", "0") != "1":
        return False
    return (
        cfg.causal
        and tuple(dilations) == (1, 1)
        and "shortcut" in p
        and p["block"][0]["w"].shape[0] == 3
        and p["block"][1]["w"].shape[0] == 1
        and p["shortcut"]["w"].shape[0] == 1
    )


def _apply_resnet(x, p, cfg: SEANetConfig, dilations):
    """ELU→conv(k_res, dilation)→ELU→conv(1) with (conv|identity) shortcut."""
    if _resblock_pallas_eligible(p, cfg, dilations):
        import os

        from audiocodecs_tpu.ops.seanet_block_pallas import (
            seanet_resblock_pallas,
        )

        # the experimental fused kernel is f32-only; restore the incoming
        # activation dtype so a following bf16 conv sees matching operands
        in_dtype = x.dtype
        x = x.astype(jnp.float32)
        p = _cast_tree(p, jnp.float32)
        xp = pad1d(x, 2, 0, mode=cfg.pad_mode)
        out = seanet_resblock_pallas(
            xp,
            p["block"][0]["w"], p["block"][0]["b"],
            p["block"][1]["w"][0], p["block"][1]["b"],
            p["shortcut"]["w"][0], p["shortcut"]["b"],
            precision_name=os.environ.get("ACX_CONV_PRECISION", "highest"),
        )
        return out.astype(in_dtype)
    h = x
    for bi, dil in enumerate(dilations):
        h = elu(h)
        b = p["block"][bi]
        h = causal_conv1d(h, b["w"], b["b"], dilation=dil,
                          causal=cfg.causal, pad_mode=cfg.pad_mode)
    if "shortcut" in p:
        s = p["shortcut"]
        x = causal_conv1d(x, s["w"], s["b"], causal=cfg.causal,
                          pad_mode=cfg.pad_mode)
    return x + h


def _apply_convtr(x, p, cfg: SEANetConfig, kernel: int, stride: int):
    import os

    if (os.environ.get("ACX_POLYPHASE_CONVTR", "0") == "1"
            and cfg.causal and cfg.trim_right_ratio == 1.0
            and kernel == 2 * stride):
        # Polyphase form: the causal K=2s transposed conv's trimmed output
        # as a stride-1 conv with 2 taps per phase — identical output with
        # s× fewer nominal MACs. Measured ~neutral on TPU (XLA already
        # lowers lhs-dilated convs without materializing the zeros), so
        # opt-in via ACX_POLYPHASE_CONVTR=1.
        return _polyphase_causal_convtr(x, p["w"], p["b"], stride)
    y = conv_transpose1d(x, p["w"], p["b"], stride=stride)
    padding_total = kernel - stride
    if cfg.causal:
        import math
        right = math.ceil(padding_total * cfg.trim_right_ratio)
    else:
        right = padding_total // 2
    left = padding_total - right
    return y[:, left : y.shape[1] - right]


def _polyphase_causal_convtr(x, w, b, stride: int):
    """``x``: [B, T, Cin]; ``w``: [K=2s, Cin, Cout] (pre-flipped) →
    [B, T·s, Cout] — exactly the causally-trimmed transposed conv."""
    from audiocodecs_tpu.nn.layers import conv1d as _conv1d

    K, Cin, Cout = w.shape
    s = stride
    # conv tap κ ∈ {0, 1} reads xpad[t+κ] = x[t−1+κ]; phase φ ∈ [0, s).
    # y[t·s+φ] = x[t]·w̃[2s−1−φ] + x[t−1]·w̃[s−1−φ]
    #         ⇒ poly[κ=0] = w̃[s−1−φ] (x[t−1]), poly[κ=1] = w̃[2s−1−φ].
    phase = jnp.arange(s)
    taps = jnp.arange(2)
    idx = (K - 1) - phase[None, :] - (1 - taps)[:, None] * s  # [2, s]
    poly = w[idx]  # [2, s, Cin, Cout]
    poly = jnp.transpose(poly, (0, 2, 1, 3)).reshape(2, Cin, s * Cout)
    xpad = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))
    y = _conv1d(xpad, poly)  # [B, T, s·Cout]
    B, T = y.shape[0], y.shape[1]
    y = y.reshape(B, T * s, Cout)
    return y + b


def _cast_tree(p, dt):
    return jax.tree.map(lambda a: a.astype(dt), p)


def _apply_plan(x, params, plan, cfg: SEANetConfig, lstm_state=None,
                role: str = "encoder"):
    from audiocodecs_tpu.nn.layers import act_dtype, conv_role

    dt = act_dtype(role)
    in_dtype = x.dtype
    x = x.astype(dt)
    new_lstm_state = {}
    with conv_role(role):
        x, new_lstm_state = _apply_plan_body(
            x, params, plan, cfg, lstm_state, dt, new_lstm_state)
    return x.astype(in_dtype), new_lstm_state


def _apply_plan_body(x, params, plan, cfg, lstm_state, dt, new_lstm_state):
    for spec in plan:
        kind, idx = spec[0], spec[1]
        key = str(idx)
        if kind == "elu":
            x = elu(x)
        elif kind == "conv":
            _, _, _cin, _cout, k, stride, dil = spec
            p = _cast_tree(params[key], dt)
            x = causal_conv1d(x, p["w"], p["b"], stride=stride, dilation=dil,
                              causal=cfg.causal, pad_mode=cfg.pad_mode)
        elif kind == "convtr":
            _, _, _cin, _cout, k, stride = spec
            x = _apply_convtr(x, _cast_tree(params[key], dt), cfg, k, stride)
        elif kind == "resnet":
            _, _, _ch, dilations = spec
            x = _apply_resnet(x, _cast_tree(params[key], dt), cfg, dilations)
        elif kind == "lstm":
            # f32 island: the recurrence accumulates over hundreds of steps,
            # where bf16 drift compounds — keep the LSTM exact.
            state = None if lstm_state is None else lstm_state.get(key)
            xf = x.astype(jnp.float32)
            y, st = lstm(xf, params[key], state)
            x = (xf + y).astype(dt)  # residual LSTM
            new_lstm_state[key] = st
        elif kind == "bilstm":
            from audiocodecs_tpu.nn.lstm import bilstm

            xf = x.astype(jnp.float32)
            y = bilstm(xf, params[key])
            x = (y + jnp.concatenate([xf, xf], axis=-1)).astype(dt)
        else:
            raise ValueError(kind)
    # f32 island at the stack boundary: the caller-side quantizer distance
    # computations (and waveform outputs) stay exact-f32 (the outer
    # _apply_plan re-casts to the input dtype).
    return x, new_lstm_state


def apply_encoder(params, x: jax.Array, cfg: SEANetConfig) -> jax.Array:
    """``[B, T, audio_channels]`` → ``[B, N, hidden_size]``."""
    y, _ = _apply_plan(x, params, seanet_encoder_plan(cfg), cfg,
                       role="encoder")
    return y


def apply_decoder(params, z: jax.Array, cfg: SEANetConfig) -> jax.Array:
    """``[B, N, hidden_size]`` → ``[B, T, audio_channels]``."""
    y, _ = _apply_plan(z, params, seanet_decoder_plan(cfg), cfg,
                       role="decoder")
    return y


# ----------------------------------------------------------------------- #
# Streaming (chunked-causal) execution with carried conv/LSTM state
# ----------------------------------------------------------------------- #


def init_stream_state(params, plan, cfg: SEANetConfig, batch: int):
    """Zero state pytree for streaming execution of a SEANet plan.

    Only valid for causal configs with zero ("constant") padding — the state
    replaces the left padding, so batch and streaming execution match
    exactly (Mimi-style; reflect-padded codecs differ at stream start).
    """
    from audiocodecs_tpu.nn.streaming import init_conv_state, init_convtr_state

    if not cfg.causal:
        raise ValueError("streaming requires a causal SEANet config")
    state = {}
    for spec in plan:
        kind, idx = spec[0], spec[1]
        key = str(idx)
        if kind == "conv":
            _, _, cin, _cout, k, stride, dil = spec
            state[key] = init_conv_state(batch, k, stride, cin, dil)
        elif kind == "convtr":
            _, _, _cin, cout, k, stride = spec
            state[key] = init_convtr_state(batch, k, stride, cout)
        elif kind == "resnet":
            _, _, ch, dilations = spec
            hidden = ch // cfg.compress
            ks = (cfg.residual_kernel_size, 1)
            block = []
            for bi, (kk, dd) in enumerate(zip(ks, dilations)):
                cin = ch if bi == 0 else hidden
                block.append(init_conv_state(batch, kk, 1, cin, dd))
            s = {"block": block}
            if cfg.use_conv_shortcut:
                s["shortcut"] = init_conv_state(batch, 1, 1, ch)
            state[key] = s
        elif kind == "lstm":
            _, _, dim = spec
            state[key] = [
                (jnp.zeros((batch, dim)), jnp.zeros((batch, dim)))
                for _ in range(cfg.num_lstm_layers)
            ]
        elif kind != "elu":
            # e.g. "bilstm": silently skipping would surface later as an
            # opaque channel mismatch (or, worse, wrong audio)
            raise NotImplementedError(
                f"streaming has no state/kernel for plan kind {kind!r}")
    return state


def apply_plan_streaming(x, params, plan, cfg: SEANetConfig, state):
    """One chunk through a SEANet plan with carried state → (y, new_state)."""
    from audiocodecs_tpu.nn.streaming import conv_stream, convtr_stream

    new_state = dict(state)
    for spec in plan:
        kind, idx = spec[0], spec[1]
        key = str(idx)
        if kind == "elu":
            x = elu(x)
        elif kind == "conv":
            _, _, _cin, _cout, k, stride, dil = spec
            p = params[key]
            x, new_state[key] = conv_stream(
                x, state[key], p["w"], p["b"], stride=stride, dilation=dil
            )
        elif kind == "convtr":
            _, _, _cin, _cout, k, stride = spec
            p = params[key]
            x, new_state[key] = convtr_stream(
                x, state[key], p["w"], p["b"], stride=stride
            )
        elif kind == "resnet":
            _, _, ch, dilations = spec
            p, s = params[key], state[key]
            h = x
            new_block = []
            for bi, dil in enumerate(dilations):
                h = elu(h)
                b = p["block"][bi]
                h, ns = conv_stream(h, s["block"][bi], b["w"], b["b"],
                                    dilation=dil)
                new_block.append(ns)
            ns_all = {"block": new_block}
            if "shortcut" in p:
                sc = p["shortcut"]
                x, ns_sc = conv_stream(x, s["shortcut"], sc["w"], sc["b"])
                ns_all["shortcut"] = ns_sc
            new_state[key] = ns_all
            x = x + h
        elif kind == "lstm":
            y, st = lstm(x, params[key], state[key])
            x = x + y
            new_state[key] = st
        else:
            raise NotImplementedError(
                f"streaming has no kernel for plan kind {kind!r}")
    return x, new_state


# ----------------------------------------------------------------------- #
# Init (for tests / training-from-scratch)
# ----------------------------------------------------------------------- #


def _init_conv(key, cin, cout, k):
    k1, k2 = jax.random.split(key)
    scale = 1.0 / jnp.sqrt(cin * k)
    return {
        "w": jax.random.normal(k1, (k, cin, cout)) * scale,
        "b": jax.random.uniform(k2, (cout,), minval=-scale, maxval=scale),
    }


def init_seanet_params(key, cfg: SEANetConfig, plan):
    params = {}
    for spec in plan:
        kind, idx = spec[0], spec[1]
        key, sub = jax.random.split(key)
        if kind == "conv":
            _, _, cin, cout, k, _, _ = spec
            params[str(idx)] = _init_conv(sub, cin, cout, k)
        elif kind == "convtr":
            _, _, cin, cout, k, _ = spec
            params[str(idx)] = _init_conv(sub, cin, cout, k)
        elif kind == "resnet":
            _, _, ch, dilations = spec
            hidden = ch // cfg.compress
            ks = (cfg.residual_kernel_size, 1)
            block = []
            for bi, kk in enumerate(ks):
                key, sub = jax.random.split(key)
                cin = ch if bi == 0 else hidden
                cout = ch if bi == len(ks) - 1 else hidden
                block.append(_init_conv(sub, cin, cout, kk))
            p = {"block": block}
            if cfg.use_conv_shortcut:
                key, sub = jax.random.split(key)
                p["shortcut"] = _init_conv(sub, ch, ch, 1)
            params[str(idx)] = p
        elif kind == "lstm":
            _, _, dim = spec
            params[str(idx)] = init_lstm_params(sub, cfg.num_lstm_layers, dim, dim)
        elif kind == "bilstm":
            from audiocodecs_tpu.nn.lstm import init_bilstm_params

            _, _, dim = spec
            params[str(idx)] = init_bilstm_params(
                sub, cfg.num_lstm_layers, dim, dim
            )
    return params
