"""SemantiCodec LDM decode chain: torch oracles + converter schema tests.

The vendor chain (reference ``audiocodecs/semanticodec.py:70-76``) is
HiFi-GAN vocoder + AutoencoderKL + CompVis LDM UNet. No vendor package
exists in this image, so each component is oracle-tested against a minimal
torch implementation written to the documented vendor semantics, with the
converter consuming the torch ``state_dict()`` — the same path a real
checkpoint would take.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402
from torch.nn.utils import weight_norm  # noqa: E402

from audiocodecs_tpu.convert.ldm import (  # noqa: E402
    convert_hifigan_state_dict,
    convert_unet_state_dict,
    convert_vae_state_dict,
    hifigan_schema,
    split_ldm_checkpoint,
    unet_schema,
    vae_schema,
)
from audiocodecs_tpu.nn.hifigan import (  # noqa: E402
    HiFiGANConfig,
    apply_hifigan,
    init_hifigan_params,
)
from audiocodecs_tpu.nn.ldm_unet import (  # noqa: E402
    UNetConfig,
    apply_unet,
    init_unet_params,
    timestep_embedding,
)
from audiocodecs_tpu.nn.ldm_vae import (  # noqa: E402
    VAEConfig,
    apply_vae_decoder,
    apply_vae_encoder,
    init_vae_params,
)

from test_zoo_converters import assert_same_structure, synth_state_dict


def randomize_(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05
                    + (1.0 if p.ndim == 1 else 0.0) * 0.0)
    return model


# ----------------------------- HiFi-GAN -------------------------------- #


class TorchResBlock1(nn.Module):
    def __init__(self, ch, k, dilations):
        super().__init__()
        self.convs1 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, 1, dilation=d,
                                  padding=(k * d - d) // 2))
            for d in dilations])
        self.convs2 = nn.ModuleList([
            weight_norm(nn.Conv1d(ch, ch, k, 1, padding=(k - 1) // 2))
            for _ in dilations])

    def forward(self, x):
        for c1, c2 in zip(self.convs1, self.convs2):
            xt = c1(F.leaky_relu(x, 0.1))
            xt = c2(F.leaky_relu(xt, 0.1))
            x = x + xt
        return x


class TorchGenerator(nn.Module):
    """jik876/AudioLDM HiFi-GAN Generator (ResBlock1 variant)."""

    def __init__(self, cfg: HiFiGANConfig):
        super().__init__()
        self.cfg = cfg
        self.conv_pre = weight_norm(
            nn.Conv1d(cfg.num_mels, cfg.upsample_initial_channel, 7,
                      padding=3))
        self.ups = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        ch = cfg.upsample_initial_channel
        for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                       cfg.upsample_kernel_sizes)):
            cout = cfg.stage_channels(i)
            self.ups.append(weight_norm(
                nn.ConvTranspose1d(ch, cout, k, u, padding=(k - u) // 2)))
            for rk, rd in zip(cfg.resblock_kernel_sizes,
                              cfg.resblock_dilation_sizes):
                self.resblocks.append(TorchResBlock1(cout, rk, rd))
            ch = cout
        self.conv_post = weight_norm(nn.Conv1d(ch, 1, 7, padding=3))

    def forward(self, x):
        nk = len(self.cfg.resblock_kernel_sizes)
        x = self.conv_pre(x)
        for i, up in enumerate(self.ups):
            x = up(F.leaky_relu(x, 0.1))
            xs = sum(self.resblocks[i * nk + j](x) for j in range(nk))
            x = xs / nk
        x = F.leaky_relu(x)  # vendor's bare default-slope call
        return torch.tanh(self.conv_post(x))


HIFI_SMALL = HiFiGANConfig(
    num_mels=8,
    upsample_rates=(5, 2),
    upsample_kernel_sizes=(16, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 3), (1, 3)),
)


def test_hifigan_torch_parity():
    cfg = HIFI_SMALL
    ref = randomize_(TorchGenerator(cfg)).eval()
    params = convert_hifigan_state_dict(ref.state_dict(), cfg)
    mel = np.random.default_rng(1).standard_normal((2, 8, 17)).astype(
        np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(mel))[:, 0].numpy()
    got = np.asarray(apply_hifigan(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(mel.transpose(0, 2, 1)), cfg))
    assert got.shape == want.shape  # odd K-u: length 17·10 + trims
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_hifigan_schema_matches_init():
    cfg = HIFI_SMALL
    sd = synth_state_dict(hifigan_schema(cfg))
    params = convert_hifigan_state_dict(sd, cfg)
    init = init_hifigan_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "hifigan")


def test_hifigan_default_config_is_audioldm_16k():
    cfg = HiFiGANConfig()
    assert cfg.hop_length == 160 and cfg.num_mels == 64
    # schema of the real vocoder resolves without error
    assert len(hifigan_schema(cfg)) > 100


# ------------------------------- VAE ----------------------------------- #


def tnorm(c):
    return nn.GroupNorm(min(32, c), c, eps=1e-6)


class TResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = tnorm(cin)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = tnorm(cout)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.nin_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x):
        h = self.conv1(F.silu(self.norm1(x)))
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "nin_shortcut"):
            x = self.nin_shortcut(x)
        return x + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.norm = tnorm(c)
        self.q = nn.Conv2d(c, c, 1)
        self.k = nn.Conv2d(c, c, 1)
        self.v = nn.Conv2d(c, c, 1)
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.norm(x)
        q = self.q(h).reshape(b, c, hh * ww).permute(0, 2, 1)
        k = self.k(h).reshape(b, c, hh * ww)
        w_ = torch.softmax(torch.bmm(q, k) * c ** -0.5, dim=2)
        v = self.v(h).reshape(b, c, hh * ww)
        h = torch.bmm(v, w_.permute(0, 2, 1)).reshape(b, c, hh, ww)
        return x + self.proj_out(h)


class TMid(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.block_1 = TResnet(c, c)
        self.attn_1 = TAttn(c)
        self.block_2 = TResnet(c, c)

    def forward(self, x):
        return self.block_2(self.attn_1(self.block_1(x)))


class TDecoder(nn.Module):
    """CompVis ``Decoder``: ``up`` indexed outermost-first, applied
    reversed."""

    def __init__(self, cfg: VAEConfig):
        super().__init__()
        L = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        self.conv_in = nn.Conv2d(cfg.z_channels, block_in, 3, padding=1)
        self.mid = TMid(block_in)
        self.up = nn.ModuleList()
        ch = block_in
        levels = []
        for i in reversed(range(L)):
            cout = cfg.ch * cfg.ch_mult[i]
            lvl = nn.Module()
            lvl.block = nn.ModuleList(
                [TResnet(ch if j == 0 else cout, cout)
                 for j in range(cfg.num_res_blocks + 1)])
            ch = cout
            if i != 0:
                lvl.upsample = nn.Module()
                lvl.upsample.conv = nn.Conv2d(ch, ch, 3, padding=1)
            levels.insert(0, lvl)
        for lvl in levels:
            self.up.append(lvl)
        self.norm_out = tnorm(ch)
        self.conv_out = nn.Conv2d(ch, cfg.out_channels, 3, padding=1)

    def forward(self, z):
        h = self.mid(self.conv_in(z))
        for i in reversed(range(len(self.up))):
            for blk in self.up[i].block:
                h = blk(h)
            if hasattr(self.up[i], "upsample"):
                h = F.interpolate(h, scale_factor=2.0, mode="nearest")
                h = self.up[i].upsample.conv(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TEncoder(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        L = len(cfg.ch_mult)
        self.conv_in = nn.Conv2d(cfg.in_channels, cfg.ch, 3, padding=1)
        self.down = nn.ModuleList()
        ch = cfg.ch
        for i, m in enumerate(cfg.ch_mult):
            cout = cfg.ch * m
            lvl = nn.Module()
            lvl.block = nn.ModuleList(
                [TResnet(ch if j == 0 else cout, cout)
                 for j in range(cfg.num_res_blocks)])
            ch = cout
            if i != L - 1:
                lvl.downsample = nn.Module()
                lvl.downsample.conv = nn.Conv2d(ch, ch, 3, stride=2)
            self.down.append(lvl)
        self.mid = TMid(ch)
        self.norm_out = tnorm(ch)
        self.conv_out = nn.Conv2d(ch, 2 * cfg.z_channels, 3, padding=1)

    def forward(self, x):
        h = self.conv_in(x)
        for lvl in self.down:
            for blk in lvl.block:
                h = blk(h)
            if hasattr(lvl, "downsample"):
                h = F.pad(h, (0, 1, 0, 1))
                h = lvl.downsample.conv(h)
        h = self.mid(h)
        return self.conv_out(F.silu(self.norm_out(h)))


class TAutoencoderKL(nn.Module):
    def __init__(self, cfg: VAEConfig):
        super().__init__()
        self.encoder = TEncoder(cfg)
        self.decoder = TDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.z_channels, 2 * cfg.embed_dim, 1)
        self.post_quant_conv = nn.Conv2d(cfg.embed_dim, cfg.z_channels, 1)


VAE_SMALL = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                      z_channels=4, embed_dim=4)


def test_vae_torch_parity():
    cfg = VAE_SMALL
    ref = randomize_(TAutoencoderKL(cfg)).eval()
    params = jax.tree.map(jnp.asarray,
                          convert_vae_state_dict(ref.state_dict(), cfg))
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 1, 16, 8)).astype(np.float32)  # B C T M
    with torch.no_grad():
        moments = ref.quant_conv(ref.encoder(torch.from_numpy(x)))
        mean = moments[:, : cfg.embed_dim]
        dec = ref.decoder(ref.post_quant_conv(mean)).numpy()
    got_mean, got_logvar = apply_vae_encoder(
        params, jnp.asarray(x.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(
        np.asarray(got_mean),
        mean.numpy().transpose(0, 2, 3, 1), atol=3e-5, rtol=1e-4)
    got_dec = apply_vae_decoder(params, got_mean, cfg)
    np.testing.assert_allclose(
        np.asarray(got_dec), dec.transpose(0, 2, 3, 1), atol=3e-4,
        rtol=1e-3)


def test_vae_schema_matches_init():
    cfg = VAE_SMALL
    sd = synth_state_dict(vae_schema(cfg))
    params = convert_vae_state_dict(sd, cfg)
    init = init_vae_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "ldm_vae")


# ------------------------------- UNet ----------------------------------- #


class TCrossAttention(nn.Module):
    def __init__(self, dim, ctx_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads = heads
        self.scale = dim_head ** -0.5
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(ctx_dim, inner, bias=False)
        self.to_v = nn.Linear(ctx_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim))

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, n, _ = x.shape
        h = self.heads
        q = self.to_q(x).view(b, n, h, -1).transpose(1, 2)
        k = self.to_k(ctx).view(b, ctx.shape[1], h, -1).transpose(1, 2)
        v = self.to_v(ctx).view(b, ctx.shape[1], h, -1).transpose(1, 2)
        attn = torch.softmax(q @ k.transpose(-2, -1) * self.scale, dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(b, n, -1)
        return self.to_out(out)


class TGEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        x, gate = self.proj(x).chunk(2, dim=-1)
        return x * F.gelu(gate)


class TBasicBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads, dim_head):
        super().__init__()
        self.attn1 = TCrossAttention(dim, dim, heads, dim_head)
        self.ff = nn.Module()
        self.ff.net = nn.Sequential(TGEGLU(dim, dim * 4), nn.Identity(),
                                    nn.Linear(dim * 4, dim))
        self.attn2 = TCrossAttention(dim, ctx_dim, heads, dim_head)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context):
        x = self.attn1(self.norm1(x)) + x
        x = self.attn2(self.norm2(x), context) + x
        return self.ff.net(self.norm3(x)) + x


class TSpatialTransformer(nn.Module):
    def __init__(self, c, ctx_dim, heads, dim_head, depth):
        super().__init__()
        self.norm = tnorm(c)
        self.proj_in = nn.Conv2d(c, c, 1)
        self.transformer_blocks = nn.ModuleList(
            [TBasicBlock(c, ctx_dim, heads, dim_head) for _ in range(depth)])
        self.proj_out = nn.Conv2d(c, c, 1)

    def forward(self, x, context):
        b, c, hh, ww = x.shape
        x_in = x
        h = self.proj_in(self.norm(x))
        h = h.reshape(b, c, hh * ww).permute(0, 2, 1)
        for blk in self.transformer_blocks:
            h = blk(h, context)
        h = h.permute(0, 2, 1).reshape(b, c, hh, ww)
        return x_in + self.proj_out(h)


class TUNetRes(nn.Module):
    def __init__(self, cin, cout, emb):
        super().__init__()
        self.in_layers = nn.Sequential(
            nn.GroupNorm(min(32, cin), cin), nn.SiLU(),
            nn.Conv2d(cin, cout, 3, padding=1))
        self.emb_layers = nn.Sequential(nn.SiLU(), nn.Linear(emb, cout))
        self.out_layers = nn.Sequential(
            nn.GroupNorm(min(32, cout), cout), nn.SiLU(), nn.Identity(),
            nn.Conv2d(cout, cout, 3, padding=1))
        self.skip_connection = (nn.Conv2d(cin, cout, 1) if cin != cout
                                else nn.Identity())

    def forward(self, x, emb):
        h = self.in_layers(x)
        h = h + self.emb_layers(emb)[:, :, None, None]
        return self.skip_connection(x) + self.out_layers(h)


class TBlockSeq(nn.ModuleList):
    def forward(self, x, emb, context):
        for m in self:
            if isinstance(m, TUNetRes):
                x = m(x, emb)
            elif isinstance(m, TSpatialTransformer):
                x = m(x, context)
            else:
                x = m(x)
        return x


class TDown(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.op = nn.Conv2d(c, c, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def t_timestep_embedding(t, dim):
    half = dim // 2
    freqs = torch.exp(-np.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None].float() * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TUNetModel(nn.Module):
    def __init__(self, cfg: UNetConfig):
        super().__init__()
        self.cfg = cfg
        mc = cfg.model_channels
        self.time_embed = nn.Sequential(
            nn.Linear(mc, cfg.emb_dim), nn.SiLU(),
            nn.Linear(cfg.emb_dim, cfg.emb_dim))
        dh = cfg.num_head_channels

        def st(c):
            return TSpatialTransformer(c, cfg.context_dim, c // dh, dh,
                                       cfg.transformer_depth)

        self.input_blocks = nn.ModuleList(
            [TBlockSeq([nn.Conv2d(cfg.in_channels, mc, 3, padding=1)])])
        ch, ds = mc, 1
        skip = [mc]
        for i, mult in enumerate(cfg.channel_mult):
            for _ in range(cfg.num_res_blocks):
                mods = [TUNetRes(ch, mult * mc, cfg.emb_dim)]
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    mods.append(st(ch))
                self.input_blocks.append(TBlockSeq(mods))
                skip.append(ch)
            if i != len(cfg.channel_mult) - 1:
                self.input_blocks.append(TBlockSeq([TDown(ch)]))
                skip.append(ch)
                ds *= 2
        self.middle_block = TBlockSeq(
            [TUNetRes(ch, ch, cfg.emb_dim), st(ch),
             TUNetRes(ch, ch, cfg.emb_dim)])
        self.output_blocks = nn.ModuleList()
        for i, mult in reversed(list(enumerate(cfg.channel_mult))):
            for j in range(cfg.num_res_blocks + 1):
                mods = [TUNetRes(ch + skip.pop(), mult * mc, cfg.emb_dim)]
                ch = mult * mc
                if ds in cfg.attention_resolutions:
                    mods.append(st(ch))
                if i and j == cfg.num_res_blocks:
                    mods.append(TUp(ch))
                    ds //= 2
                self.output_blocks.append(TBlockSeq(mods))
        self.out = nn.Sequential(
            nn.GroupNorm(min(32, ch), ch), nn.SiLU(),
            nn.Conv2d(ch, cfg.out_channels, 3, padding=1))

    def forward(self, x, t, context):
        emb = self.time_embed(t_timestep_embedding(t, self.cfg.model_channels))
        hs = []
        h = x
        for blk in self.input_blocks:
            h = blk(h, emb, context)
            hs.append(h)
        h = self.middle_block(h, emb, context)
        for blk in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            h = blk(h, emb, context)
        return self.out(h)


UNET_SMALL = UNetConfig(
    in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
    attention_resolutions=(2,), channel_mult=(1, 2), num_head_channels=16,
    context_dim=24, transformer_depth=1,
)


def test_timestep_embedding_order():
    t = jnp.asarray([0.0, 3.0, 999.0])
    got = np.asarray(timestep_embedding(t, 32))
    want = t_timestep_embedding(torch.tensor([0.0, 3.0, 999.0]), 32).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_unet_torch_parity():
    cfg = UNET_SMALL
    ref = randomize_(TUNetModel(cfg)).eval()
    params = jax.tree.map(jnp.asarray,
                          convert_unet_state_dict(ref.state_dict(), cfg))
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    ctx = rng.standard_normal((2, 5, 24)).astype(np.float32)
    t = np.asarray([7.0, 341.0], np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t),
                   torch.from_numpy(ctx)).numpy()
    got = apply_unet(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                     jnp.asarray(t), jnp.asarray(ctx), cfg)
    np.testing.assert_allclose(
        np.asarray(got), want.transpose(0, 2, 3, 1), atol=5e-4, rtol=1e-3)


def test_unet_schema_matches_init():
    cfg = UNET_SMALL
    sd = synth_state_dict(unet_schema(cfg))
    params = convert_unet_state_dict(sd, cfg)
    init = init_unet_params(jax.random.PRNGKey(0), cfg)
    assert_same_structure(params, init, "ldm_unet")


def test_split_ldm_checkpoint():
    sd = {
        "first_stage_model.encoder.conv_in.weight": 1,
        "first_stage_model.loss.disc.weight": 2,
        "model.diffusion_model.time_embed.0.weight": 3,
        "model_ema.decay": 4,
        "betas": 5,
        "cond_stage_model.x": 6,
    }
    parts = split_ldm_checkpoint(sd)
    assert parts["vae"] == {"encoder.conv_in.weight": 1}
    assert parts["unet"] == {"time_embed.0.weight": 3}


# --------------------- SemantiCodec "ldm" variant ----------------------- #


def tiny_ldm_codec_config():
    from audiocodecs_tpu.models.semanticodec import SemantiCodecModelConfig

    return SemantiCodecModelConfig(
        mel_bins=16, window_frames=32, patch_size=16,
        vit_hidden=32, vit_layers=1, vit_heads=2,
        semantic_vocab=16, acoustic_vocab=16,
        ddim_steps=2, decoder_variant="ldm", ldm_mel_bins=16,
        vae_cfg=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1,
                          z_channels=4, embed_dim=4),
        unet_channels=32, unet_channel_mult=(1, 2), unet_num_res_blocks=1,
        unet_attention_resolutions=(2,), unet_head_channels=16,
        vocoder_cfg=HiFiGANConfig(
            num_mels=16, upsample_rates=(5, 4, 2, 2, 2),
            upsample_kernel_sizes=(16, 16, 8, 4, 4),
            upsample_initial_channel=64,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1,),)),
    )


def test_semanticodec_ldm_variant_roundtrip_shapes():
    from audiocodecs_tpu.models.semanticodec import SemantiCodec

    mc = tiny_ldm_codec_config()
    codec = SemantiCodec(16000, 16000, "reconstruct", model_config=mc,
                         key=jax.random.PRNGKey(0))
    sig = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 3200)), jnp.float32)
    toks = codec.sig_to_toks(sig)
    assert toks.shape[-1] == 2 and toks.shape[0] == 1
    rec = codec.toks_to_sig(toks)
    assert rec.ndim == 2 and rec.shape[0] == 1 and rec.shape[1] > 0
    assert bool(jnp.all(jnp.isfinite(rec)))


def test_semanticodec_ldm_component_assembly():
    """Full-checkpoint assembly: LDM sd (prefixed VAE+UNet+scale_factor) +
    vocoder sd convert into the codec's param tree, structure-identical to
    init."""
    from audiocodecs_tpu.convert.zoo import convert_semanticodec_components
    from audiocodecs_tpu.models.semanticodec import (
        init_semanticodec_params,
    )

    mc = tiny_ldm_codec_config()
    ldm_sd = {}
    for k, v in synth_state_dict(vae_schema(mc.vae_cfg)).items():
        ldm_sd[f"first_stage_model.{k}"] = v
    for k, v in synth_state_dict(unet_schema(mc.unet())).items():
        ldm_sd[f"model.diffusion_model.{k}"] = v
    ldm_sd["scale_factor"] = np.asarray(0.7, np.float32)
    voc_sd = synth_state_dict(hifigan_schema(mc.vocoder_cfg))

    init = init_semanticodec_params(jax.random.PRNGKey(0), mc)
    params = convert_semanticodec_components(
        mc, base_params=init, ldm_sd=ldm_sd, vocoder_sd=voc_sd)
    assert_same_structure(params, init, "semanticodec-ldm")
    assert float(np.asarray(params["latent_scale"])) == pytest.approx(0.7)
