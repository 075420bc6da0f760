"""AudioLDM-lineage LDM checkpoint converters (SemantiCodec decode chain).

Maps the three vendor components behind ``audiocodecs/semanticodec.py:70-76``
to repo-native pytrees:

  * HiFi-GAN vocoder (jik876 ``Generator`` naming: ``conv_pre``, ``ups.N``,
    flat ``resblocks.{i·nk+j}.convs{1,2}.{k}``, ``conv_post``; all
    weight-normed) → :mod:`audiocodecs_tpu.nn.hifigan`;
  * AutoencoderKL (CompVis naming: ``encoder./decoder.`` with
    ``mid.block_1``, ``up.{level}.block.{j}``, ``nin_shortcut``,
    ``quant_conv``/``post_quant_conv``) → :mod:`audiocodecs_tpu.nn.ldm_vae`;
  * LDM UNet (CompVis ``openaimodel`` naming: ``time_embed.{0,2}``,
    ``input_blocks.{n}.{0,1}``, ``middle_block.{0,1,2}``,
    ``output_blocks.{n}.*``, ``out.{0,2}``) →
    :mod:`audiocodecs_tpu.nn.ldm_unet`.

Layout rules: Conv2d ``[Cout, Cin, kh, kw]`` → ``[kh, kw, Cin, Cout]``
('HWIO'); Linear ``[out, in]`` → ``[in, out]``; ConvTranspose1d flipped via
:func:`torch_utils.conv_transpose_weight`; GroupNorm/LayerNorm
``weight/bias`` → ``scale/bias``. Strict: unmapped keys raise with names.

``split_ldm_checkpoint`` carves a full latent-diffusion checkpoint
(``first_stage_model.*`` / ``model.diffusion_model.*`` / EMA and loss keys
dropped) into the three sub-dicts these converters take.
"""

from __future__ import annotations

import numpy as np

from audiocodecs_tpu.convert.torch_utils import (
    conv_transpose_weight,
    conv_weight,
    to_np,
)
from audiocodecs_tpu.convert.zoo import _strict, _TrackingDict
from audiocodecs_tpu.nn.hifigan import HiFiGANConfig
from audiocodecs_tpu.nn.ldm_unet import UNetConfig
from audiocodecs_tpu.nn.ldm_vae import VAEConfig

__all__ = [
    "convert_hifigan_state_dict", "hifigan_schema",
    "convert_vae_state_dict", "vae_schema",
    "convert_unet_state_dict", "unet_schema",
    "split_ldm_checkpoint",
]


# --------------------------- shared helpers --------------------------- #


def _conv2d(sd, prefix):
    w = to_np(sd[f"{prefix}.weight"]).astype(np.float32)
    return {
        "w": np.ascontiguousarray(w.transpose(2, 3, 1, 0)),
        "b": to_np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _norm(sd, prefix):
    return {
        "scale": to_np(sd[f"{prefix}.weight"]).astype(np.float32),
        "bias": to_np(sd[f"{prefix}.bias"]).astype(np.float32),
    }


def _linear(sd, prefix, bias=True):
    w = to_np(sd[f"{prefix}.weight"]).astype(np.float32)
    p = {"w": np.ascontiguousarray(w.T)}
    if bias:
        p["b"] = to_np(sd[f"{prefix}.bias"]).astype(np.float32)
    return p


# ----------------------------- HiFi-GAN ------------------------------- #


def convert_hifigan_state_dict(sd, cfg: HiFiGANConfig = None) -> dict:
    """jik876 ``Generator`` state dict → ``nn.hifigan`` params."""
    cfg = cfg or HiFiGANConfig()
    sd = _TrackingDict(sd)
    nk = len(cfg.resblock_kernel_sizes)
    params = {
        "conv_pre": conv_weight(sd, "conv_pre"),
        "ups": [],
        "resblocks": [],
        "conv_post": conv_weight(sd, "conv_post"),
    }
    for i in range(len(cfg.upsample_rates)):
        params["ups"].append(conv_transpose_weight(sd, f"ups.{i}"))
        stage = []
        for j, dil in enumerate(cfg.resblock_dilation_sizes):
            r = i * nk + j
            stage.append([
                {"c1": conv_weight(sd, f"resblocks.{r}.convs1.{k}"),
                 "c2": conv_weight(sd, f"resblocks.{r}.convs2.{k}")}
                for k in range(len(dil))
            ])
        params["resblocks"].append(stage)
    _strict(sd, "hifigan")
    return params


def hifigan_schema(cfg: HiFiGANConfig = None) -> dict:
    """{key: shape} of the vendor checkpoint (weight-normed convs)."""
    cfg = cfg or HiFiGANConfig()
    nk = len(cfg.resblock_kernel_sizes)

    def wn_conv(prefix, cout, cin, k, out):
        out[f"{prefix}.weight_g"] = (cout, 1, 1)
        out[f"{prefix}.weight_v"] = (cout, cin, k)
        out[f"{prefix}.bias"] = (cout,)

    out = {}
    wn_conv("conv_pre", cfg.upsample_initial_channel, cfg.num_mels, 7, out)
    ch = cfg.upsample_initial_channel
    for i, k in enumerate(cfg.upsample_kernel_sizes):
        cout = cfg.stage_channels(i)
        # ConvTranspose1d weight-norm: [Cin, Cout, K], g over dim 0
        out[f"ups.{i}.weight_g"] = (ch, 1, 1)
        out[f"ups.{i}.weight_v"] = (ch, cout, k)
        out[f"ups.{i}.bias"] = (cout,)
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            r = i * nk + j
            for d in range(len(rd)):
                wn_conv(f"resblocks.{r}.convs1.{d}", cout, cout, rk, out)
                wn_conv(f"resblocks.{r}.convs2.{d}", cout, cout, rk, out)
        ch = cout
    wn_conv("conv_post", 1, ch, 7, out)
    return out


# ------------------------------- VAE ---------------------------------- #


def _res_block_from(sd, prefix):
    p = {
        "norm1": _norm(sd, f"{prefix}.norm1"),
        "conv1": _conv2d(sd, f"{prefix}.conv1"),
        "norm2": _norm(sd, f"{prefix}.norm2"),
        "conv2": _conv2d(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        p["nin_shortcut"] = _conv2d(sd, f"{prefix}.nin_shortcut")
    return p


def _attn_block_from(sd, prefix):
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "q": _conv2d(sd, f"{prefix}.q"),
        "k": _conv2d(sd, f"{prefix}.k"),
        "v": _conv2d(sd, f"{prefix}.v"),
        "proj_out": _conv2d(sd, f"{prefix}.proj_out"),
    }


def convert_vae_state_dict(sd, cfg: VAEConfig = None) -> dict:
    """CompVis ``AutoencoderKL`` state dict → ``nn.ldm_vae`` params.

    Checkpoint ``decoder.up`` is indexed outermost-first (``up.0`` applied
    last); repo stores levels in application order, so index ``m`` reads
    ``up.{L-1-m}``.
    """
    cfg = cfg or VAEConfig()
    sd = _TrackingDict(sd)
    L = len(cfg.ch_mult)

    enc = {"conv_in": _conv2d(sd, "encoder.conv_in"), "down": []}
    for i in range(L):
        level = {"block": [
            _res_block_from(sd, f"encoder.down.{i}.block.{j}")
            for j in range(cfg.num_res_blocks)
        ]}
        if f"encoder.down.{i}.downsample.conv.weight" in sd:
            level["downsample"] = _conv2d(sd, f"encoder.down.{i}.downsample.conv")
        enc["down"].append(level)
    enc["mid"] = {
        "block_1": _res_block_from(sd, "encoder.mid.block_1"),
        "attn_1": _attn_block_from(sd, "encoder.mid.attn_1"),
        "block_2": _res_block_from(sd, "encoder.mid.block_2"),
    }
    enc["norm_out"] = _norm(sd, "encoder.norm_out")
    enc["conv_out"] = _conv2d(sd, "encoder.conv_out")

    dec = {"conv_in": _conv2d(sd, "decoder.conv_in")}
    dec["mid"] = {
        "block_1": _res_block_from(sd, "decoder.mid.block_1"),
        "attn_1": _attn_block_from(sd, "decoder.mid.attn_1"),
        "block_2": _res_block_from(sd, "decoder.mid.block_2"),
    }
    up = []
    for m in range(L):  # application order; checkpoint index i = L-1-m
        i = L - 1 - m
        level = {"block": [
            _res_block_from(sd, f"decoder.up.{i}.block.{j}")
            for j in range(cfg.num_res_blocks + 1)
        ]}
        if f"decoder.up.{i}.upsample.conv.weight" in sd:
            level["upsample"] = _conv2d(sd, f"decoder.up.{i}.upsample.conv")
        up.append(level)
    dec["up"] = up
    dec["norm_out"] = _norm(sd, "decoder.norm_out")
    dec["conv_out"] = _conv2d(sd, "decoder.conv_out")

    params = {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv2d(sd, "quant_conv"),
        "post_quant_conv": _conv2d(sd, "post_quant_conv"),
    }
    _strict(sd, "ldm_vae")
    return params


def vae_schema(cfg: VAEConfig = None) -> dict:
    cfg = cfg or VAEConfig()
    out = {}
    L = len(cfg.ch_mult)

    def conv(prefix, cout, cin, k):
        out[f"{prefix}.weight"] = (cout, cin, k, k)
        out[f"{prefix}.bias"] = (cout,)

    def norm(prefix, c):
        out[f"{prefix}.weight"] = (c,)
        out[f"{prefix}.bias"] = (c,)

    def res(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cout, cin, 3)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.nin_shortcut", cout, cin, 1)

    def attn(prefix, c):
        norm(f"{prefix}.norm", c)
        for q in ("q", "k", "v", "proj_out"):
            conv(f"{prefix}.{q}", c, c, 1)

    conv("encoder.conv_in", cfg.ch, cfg.in_channels, 3)
    ch = cfg.ch
    for i, m in enumerate(cfg.ch_mult):
        cout = cfg.ch * m
        for j in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{j}", ch, cout)
            ch = cout
        if i != L - 1:
            conv(f"encoder.down.{i}.downsample.conv", ch, ch, 3)
    res("encoder.mid.block_1", ch, ch)
    attn("encoder.mid.attn_1", ch)
    res("encoder.mid.block_2", ch, ch)
    norm("encoder.norm_out", ch)
    conv("encoder.conv_out", 2 * cfg.z_channels, ch, 3)

    block_in = cfg.ch * cfg.ch_mult[-1]
    conv("decoder.conv_in", block_in, cfg.z_channels, 3)
    res("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in)
    ch = block_in
    for i in reversed(range(L)):
        cout = cfg.ch * cfg.ch_mult[i]
        for j in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{j}", ch, cout)
            ch = cout
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", ch, ch, 3)
    norm("decoder.norm_out", ch)
    conv("decoder.conv_out", cfg.out_channels, ch, 3)
    conv("quant_conv", 2 * cfg.embed_dim, 2 * cfg.z_channels, 1)
    conv("post_quant_conv", cfg.z_channels, cfg.embed_dim, 1)
    return out


# ------------------------------- UNet --------------------------------- #


def _st_from(sd, prefix, depth):
    blocks = []
    for d in range(depth):
        b = f"{prefix}.transformer_blocks.{d}"
        blocks.append({
            "attn1": {
                "to_q": _linear(sd, f"{b}.attn1.to_q", bias=False)["w"],
                "to_k": _linear(sd, f"{b}.attn1.to_k", bias=False)["w"],
                "to_v": _linear(sd, f"{b}.attn1.to_v", bias=False)["w"],
                "to_out": _linear(sd, f"{b}.attn1.to_out.0"),
            },
            "attn2": {
                "to_q": _linear(sd, f"{b}.attn2.to_q", bias=False)["w"],
                "to_k": _linear(sd, f"{b}.attn2.to_k", bias=False)["w"],
                "to_v": _linear(sd, f"{b}.attn2.to_v", bias=False)["w"],
                "to_out": _linear(sd, f"{b}.attn2.to_out.0"),
            },
            "ff": {
                "proj": _linear(sd, f"{b}.ff.net.0.proj"),
                "out": _linear(sd, f"{b}.ff.net.2"),
            },
            "norm1": _norm(sd, f"{b}.norm1"),
            "norm2": _norm(sd, f"{b}.norm2"),
            "norm3": _norm(sd, f"{b}.norm3"),
        })
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "proj_in": _conv2d(sd, f"{prefix}.proj_in"),
        "blocks": blocks,
        "proj_out": _conv2d(sd, f"{prefix}.proj_out"),
    }


def _unet_res_from(sd, prefix):
    p = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv2d(sd, f"{prefix}.in_layers.2"),
        "emb": _linear(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv2d(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        p["skip"] = _conv2d(sd, f"{prefix}.skip_connection")
    return p


def convert_unet_state_dict(sd, cfg: UNetConfig = None) -> dict:
    """CompVis ``UNetModel`` state dict → ``nn.ldm_unet`` params."""
    cfg = cfg or UNetConfig()
    sd = _TrackingDict(sd)
    params = {
        "time_embed": {
            "l0": _linear(sd, "time_embed.0"),
            "l2": _linear(sd, "time_embed.2"),
        },
        "input_blocks": [{"conv": _conv2d(sd, "input_blocks.0.0")}],
        "output_blocks": [],
    }
    ds, n = 1, 1
    for i in range(len(cfg.channel_mult)):
        for _ in range(cfg.num_res_blocks):
            blk = {"res": _unet_res_from(sd, f"input_blocks.{n}.0")}
            if ds in cfg.attention_resolutions:
                blk["attn"] = _st_from(sd, f"input_blocks.{n}.1",
                                       cfg.transformer_depth)
            params["input_blocks"].append(blk)
            n += 1
        if i != len(cfg.channel_mult) - 1:
            params["input_blocks"].append(
                {"down": _conv2d(sd, f"input_blocks.{n}.0.op")})
            n += 1
            ds *= 2
    params["middle"] = {
        "res1": _unet_res_from(sd, "middle_block.0"),
        "attn": _st_from(sd, "middle_block.1", cfg.transformer_depth),
        "res2": _unet_res_from(sd, "middle_block.2"),
    }
    n = 0
    for i in reversed(range(len(cfg.channel_mult))):
        for j in range(cfg.num_res_blocks + 1):
            blk = {"res": _unet_res_from(sd, f"output_blocks.{n}.0")}
            idx = 1
            if ds in cfg.attention_resolutions:
                blk["attn"] = _st_from(sd, f"output_blocks.{n}.{idx}",
                                       cfg.transformer_depth)
                idx += 1
            if i and j == cfg.num_res_blocks:
                blk["up"] = _conv2d(sd, f"output_blocks.{n}.{idx}.conv")
                ds //= 2
            params["output_blocks"].append(blk)
            n += 1
    params["out"] = {
        "norm": _norm(sd, "out.0"),
        "conv": _conv2d(sd, "out.2"),
    }
    _strict(sd, "ldm_unet")
    return params


def unet_schema(cfg: UNetConfig = None) -> dict:
    cfg = cfg or UNetConfig()
    out = {}
    mc = cfg.model_channels

    def conv(prefix, cout, cin, k):
        out[f"{prefix}.weight"] = (cout, cin, k, k)
        out[f"{prefix}.bias"] = (cout,)

    def lin(prefix, dout, din, bias=True):
        out[f"{prefix}.weight"] = (dout, din)
        if bias:
            out[f"{prefix}.bias"] = (dout,)

    def norm(prefix, c):
        out[f"{prefix}.weight"] = (c,)
        out[f"{prefix}.bias"] = (c,)

    def res(prefix, cin, cout):
        norm(f"{prefix}.in_layers.0", cin)
        conv(f"{prefix}.in_layers.2", cout, cin, 3)
        lin(f"{prefix}.emb_layers.1", cout, cfg.emb_dim)
        norm(f"{prefix}.out_layers.0", cout)
        conv(f"{prefix}.out_layers.3", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.skip_connection", cout, cin, 1)

    def st(prefix, c):
        norm(f"{prefix}.norm", c)
        conv(f"{prefix}.proj_in", c, c, 1)
        for d in range(cfg.transformer_depth):
            b = f"{prefix}.transformer_blocks.{d}"
            lin(f"{b}.attn1.to_q", c, c, bias=False)
            lin(f"{b}.attn1.to_k", c, c, bias=False)
            lin(f"{b}.attn1.to_v", c, c, bias=False)
            lin(f"{b}.attn1.to_out.0", c, c)
            lin(f"{b}.attn2.to_q", c, c, bias=False)
            lin(f"{b}.attn2.to_k", c, cfg.context_dim, bias=False)
            lin(f"{b}.attn2.to_v", c, cfg.context_dim, bias=False)
            lin(f"{b}.attn2.to_out.0", c, c)
            lin(f"{b}.ff.net.0.proj", c * 8, c)
            lin(f"{b}.ff.net.2", c, c * 4)
            norm(f"{b}.norm1", c)
            norm(f"{b}.norm2", c)
            norm(f"{b}.norm3", c)
        conv(f"{prefix}.proj_out", c, c, 1)

    lin("time_embed.0", cfg.emb_dim, mc)
    lin("time_embed.2", cfg.emb_dim, cfg.emb_dim)
    conv("input_blocks.0.0", mc, cfg.in_channels, 3)
    ch, ds, n = mc, 1, 1
    skip_chs = [mc]
    for i, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            res(f"input_blocks.{n}.0", ch, mult * mc)
            ch = mult * mc
            if ds in cfg.attention_resolutions:
                st(f"input_blocks.{n}.1", ch)
            skip_chs.append(ch)
            n += 1
        if i != len(cfg.channel_mult) - 1:
            conv(f"input_blocks.{n}.0.op", ch, ch, 3)
            skip_chs.append(ch)
            n += 1
            ds *= 2
    res("middle_block.0", ch, ch)
    st("middle_block.1", ch)
    res("middle_block.2", ch, ch)
    n = 0
    for i, mult in reversed(list(enumerate(cfg.channel_mult))):
        for j in range(cfg.num_res_blocks + 1):
            res(f"output_blocks.{n}.0", ch + skip_chs.pop(), mult * mc)
            ch = mult * mc
            idx = 1
            if ds in cfg.attention_resolutions:
                st(f"output_blocks.{n}.{idx}", ch)
                idx += 1
            if i and j == cfg.num_res_blocks:
                conv(f"output_blocks.{n}.{idx}.conv", ch, ch, 3)
                ds //= 2
            n += 1
    norm("out.0", ch)
    conv("out.2", cfg.out_channels, ch, 3)
    return out


# --------------------------- full checkpoint --------------------------- #

_DROP_PREFIXES = (
    "model_ema.", "cond_stage_model.", "loss.", "first_stage_model.loss.",
    "scale_factor", "logvar", "betas", "alphas", "posterior", "sqrt_",
    "log_one_minus", "lvlb_weights",
)


def split_ldm_checkpoint(sd) -> dict:
    """Full LDM checkpoint → {"vae": sub_sd, "unet": sub_sd} with the
    training-only keys (EMA shadows, loss nets, registered DDPM-schedule
    buffers) dropped; the vocoder ships as a separate vendor file."""
    vae, unet = {}, {}
    for k, v in sd.items():
        if k.startswith("first_stage_model.loss."):
            continue
        if k.startswith("first_stage_model."):
            vae[k[len("first_stage_model."):]] = v
        elif k.startswith("model.diffusion_model."):
            unet[k[len("model.diffusion_model."):]] = v
        elif any(k.startswith(p) for p in _DROP_PREFIXES):
            continue
    return {"vae": vae, "unet": unet}
