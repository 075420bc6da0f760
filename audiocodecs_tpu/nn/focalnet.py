"""1-D focal modulation blocks (FocalNet-style), for the FocalCodec family.

Focal modulation replaces attention with hierarchical gated depthwise-conv
context aggregation: per block, the input projects to (query, context,
level-gates); the context passes through L successively wider depthwise
convs, each level's output gated and summed (plus a gated global-average
level); a 1×1 "modulator" projection multiplies the query elementwise.
All depthwise convs + elementwise gates — pure VPU work that XLA fuses.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from audiocodecs_tpu.nn.layers import conv1d, pad1d

__all__ = ["FocalConfig", "apply_focal_blocks", "init_focal_params"]


@dataclasses.dataclass(frozen=True)
class FocalConfig:
    dim: int = 768
    num_blocks: int = 4
    focal_levels: int = 2
    focal_window: int = 3
    mlp_ratio: float = 4.0
    eps: float = 1e-5


def _ln(x, p, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def _focal_modulation(x, p, cfg: FocalConfig):
    """[B, T, C] focal modulation."""
    C, L = cfg.dim, cfg.focal_levels
    f = jnp.einsum("btc,cd->btd", x, p["f"]["w"]) + p["f"]["b"]
    q, ctx, gates = jnp.split(f, [C, 2 * C], axis=-1)  # [.,C],[.,C],[.,L+1]
    agg = jnp.zeros_like(ctx)
    for l in range(L):
        k = cfg.focal_window + 2 * l
        pad = k // 2
        ctx = pad1d(ctx, pad, k - 1 - pad, mode="constant")
        ctx = conv1d(ctx, p["focal_convs"][l]["w"], None, groups=C)
        ctx = jax.nn.gelu(ctx, approximate=False)
        agg = agg + ctx * gates[..., l : l + 1]
    glob = jax.nn.gelu(jnp.mean(ctx, axis=1, keepdims=True), approximate=False)
    agg = agg + glob * gates[..., L : L + 1]
    modulator = jnp.einsum("btc,cd->btd", agg, p["h"]["w"]) + p["h"]["b"]
    out = q * modulator
    return jnp.einsum("btc,cd->btd", out, p["proj"]["w"]) + p["proj"]["b"]


def apply_focal_blocks(params, x: jax.Array, cfg: FocalConfig) -> jax.Array:
    for p in params["blocks"]:
        x = x + _focal_modulation(_ln(x, p["ln1"], cfg.eps), p, cfg)
        h = _ln(x, p["ln2"], cfg.eps)
        h = jnp.einsum("btc,cd->btd", h, p["mlp1"]["w"]) + p["mlp1"]["b"]
        h = jax.nn.gelu(h, approximate=False)
        h = jnp.einsum("btd,dc->btc", h, p["mlp2"]["w"]) + p["mlp2"]["b"]
        x = x + h
    return x


def init_focal_params(key, cfg: FocalConfig):
    C = cfg.dim
    hidden = int(C * cfg.mlp_ratio)

    def lin(key, i, o):
        return {"w": jax.random.normal(key, (i, o)) * i**-0.5,
                "b": jnp.zeros((o,))}

    blocks = []
    for bi in range(cfg.num_blocks):
        keys = jax.random.split(jax.random.fold_in(key, bi), 6 + cfg.focal_levels)
        focal_convs = [
            {"w": jax.random.normal(keys[6 + l],
                                    (cfg.focal_window + 2 * l, 1, C)) * 0.05}
            for l in range(cfg.focal_levels)
        ]
        blocks.append(
            {
                "ln1": {"g": jnp.ones((C,)), "b": jnp.zeros((C,))},
                "f": lin(keys[0], C, 2 * C + cfg.focal_levels + 1),
                "focal_convs": focal_convs,
                "h": lin(keys[1], C, C),
                "proj": lin(keys[2], C, C),
                "ln2": {"g": jnp.ones((C,)), "b": jnp.zeros((C,))},
                "mlp1": lin(keys[3], C, hidden),
                "mlp2": lin(keys[4], hidden, C),
            }
        )
    return {"blocks": blocks}
