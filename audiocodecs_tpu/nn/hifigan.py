"""HiFi-GAN generator (vocoder), TPU-native, channel-last.

The mel→waveform vocoder used by the AudioLDM-lineage decoders (SemantiCodec's
LDM decode chain ends in this exact generator; reference vendor chain behind
``audiocodecs/semanticodec.py:70-76`` — the ``semanticodec`` package bundles
the jik876 HiFi-GAN ``Generator`` with ResBlock1 and the AudioLDM 16 kHz
config: 64 mels, hop 160, upsample rates 5·4·2·2·2).

Structure (jik876/hifi-gan ``models.py`` lineage, all convs weight-normed in
the checkpoint and folded at conversion):

  ``conv_pre`` (k7) → per stage: leaky_relu(0.1) → ``ups[i]``
  (ConvTranspose1d, k=K_i, stride=u_i, pad=(K_i-u_i)//2) → MRF = mean of
  ``resblocks`` (ResBlock1: two weight-normed convs per dilation, residual)
  → leaky_relu(default slope 0.01, faithful to the vendor's bare
  ``F.leaky_relu``) → ``conv_post`` (k7) → tanh.

TPU notes: channel-last throughout, transposed convs stored pre-flipped so
they lower to one input-dilated conv (see ``nn.layers.conv_transpose1d``);
the MRF branches are independent convs XLA schedules back-to-back on the MXU.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import conv1d, conv_transpose1d, pad1d

__all__ = [
    "HiFiGANConfig",
    "apply_hifigan",
    "init_hifigan_params",
    "AUDIOLDM_16K",
]


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    num_mels: int = 64
    upsample_rates: tuple = (5, 4, 2, 2, 2)
    upsample_kernel_sizes: tuple = (16, 16, 8, 4, 4)
    upsample_initial_channel: int = 1024
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))

    @property
    def hop_length(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out

    def stage_channels(self, i: int) -> int:
        return self.upsample_initial_channel // (2 ** (i + 1))


# AudioLDM / SemantiCodec 16 kHz vocoder (64-bin mel, hop 160).
AUDIOLDM_16K = HiFiGANConfig()


def _leaky(x, slope):
    return jnp.where(x >= 0, x, slope * x)


def _same_conv(x, p, *, dilation=1):
    k = p["w"].shape[0]
    pad = (k - 1) * dilation // 2
    x = pad1d(x, pad, pad)
    return conv1d(x, p["w"], p["b"], dilation=dilation)


def _resblock1(params, x, kernel_size, dilations):
    """jik876 ResBlock1: per dilation d — lrelu→conv(k,d)→lrelu→conv(k,1),
    residual add."""
    del kernel_size
    for convs, d in zip(params, dilations):
        xt = _same_conv(_leaky(x, 0.1), convs["c1"], dilation=d)
        xt = _same_conv(_leaky(xt, 0.1), convs["c2"])
        x = x + xt
    return x


def apply_hifigan(params, mel: jax.Array, cfg: HiFiGANConfig) -> jax.Array:
    """``mel`` [B, T, num_mels] → waveform [B, T·hop]."""
    x = _same_conv(mel, params["conv_pre"])
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = _leaky(x, 0.1)
        up = params["ups"][i]
        y = conv_transpose1d(x, up["w"], up["b"], stride=u)
        # torch ConvTranspose1d trims `padding` from BOTH sides; with the
        # vendor's p=(K-u)//2 and odd K-u (e.g. 16-5) output is T·u+1.
        p = (k - u) // 2
        y = y[:, p: y.shape[1] - p]
        acc = None
        for j, (rk, rd) in enumerate(
            zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
        ):
            r = _resblock1(params["resblocks"][i][j], y, rk, rd)
            acc = r if acc is None else acc + r
        x = acc / len(cfg.resblock_kernel_sizes)
    x = _leaky(x, 0.01)  # vendor uses default-slope F.leaky_relu here
    x = _same_conv(x, params["conv_post"])
    return jnp.tanh(x)[..., 0]


def init_hifigan_params(key, cfg: HiFiGANConfig):
    ks = iter(jax.random.split(key, 256))

    def conv(cin, cout, k):
        return {
            "w": jax.random.normal(next(ks), (k, cin, cout)) * 0.02,
            "b": jnp.zeros((cout,)),
        }

    params = {
        "conv_pre": conv(cfg.num_mels, cfg.upsample_initial_channel, 7),
        "ups": [],
        "resblocks": [],
        "conv_post": None,
    }
    ch = cfg.upsample_initial_channel
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cout = cfg.stage_channels(i)
        params["ups"].append(conv(ch, cout, k))
        stage = []
        for rk, rd in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            stage.append(
                [{"c1": conv(cout, cout, rk), "c2": conv(cout, cout, rk)}
                 for _ in rd]
            )
        params["resblocks"].append(stage)
        ch = cout
    params["conv_post"] = conv(ch, 1, 7)
    return params
