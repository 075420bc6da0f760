"""Expert parallelism (MoE FFN) over the mesh, TPU-native.

Completes the parallelism axes (dp / tp / sp / pp / **ep**) beyond the
reference's DDP-only distribution (``/root/reference/downstream/train_asr.py:213-214``).

Switch-style top-1 MoE FFN with capacity-bounded one-hot dispatch (the
classic TPU formulation: dispatch/combine as einsums so routing lowers onto
the MXU, no scatter/gather):

  * expert weights are STACKED ``[E, ...]`` and sharded on the ``model``
    axis — each device materializes only its ``E/S`` experts;
  * activations stay data-sharded and replicated across ``model``; each
    device computes the (cheap) router + dispatch masks locally, applies
    ONLY its local experts, and the combine is a ``psum`` over the expert
    axis — expert-parallel compute with one collective, no all_to_all
    needed at this sharding;
  * overflow tokens beyond ``capacity`` are dropped by the dispatch mask
    (standard switch behavior); the residual path keeps them intact.

Everything is differentiable (einsum + psum), so ``jax.grad`` through the
``shard_map`` region yields expert-parallel backward for free.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "MoEConfig",
    "init_moe_params",
    "moe_ffn_dense",
    "moe_ffn_dense_aux",
    "make_moe_train_step",
    "shard_moe_params",
    "shard_moe_llama_params",
]


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    hidden_size: int = 64
    ffn_size: int = 128
    num_experts: int = 4
    capacity_factor: float = 2.0
    # routing: 1 = switch (gate = raw top prob, Switch Transformer §2.2);
    # k ≥ 2 = GShard-style top-k with gates renormalized over the selected
    # experts and rank-r assignments queued after ranks < r for capacity
    top_k: int = 1
    # Switch load-balancing auxiliary loss coefficient (paper uses 1e-2);
    # 0 keeps the loss out of training entirely (back-compat default)
    aux_weight: float = 0.0

    def capacity(self, tokens: int) -> int:
        return max(1, int(self.capacity_factor * tokens / self.num_experts))


def init_moe_params(key, cfg: MoEConfig):
    ks = jax.random.split(key, 4)
    D, F, E = cfg.hidden_size, cfg.ffn_size, cfg.num_experts
    return {
        "router": jax.random.normal(ks[0], (D, E)) * D**-0.5,
        "w_in": jax.random.normal(ks[1], (E, D, F)) * D**-0.5,
        "w_out": jax.random.normal(ks[2], (E, F, D)) * F**-0.5,
    }


def _route(params, x, cfg: MoEConfig):
    """x [N, D] → (dispatch [N, E, C], combine [N, E, C], aux scalar).

    ``top_k == 1``: switch routing — each token goes to its argmax expert,
    weighted by the RAW router probability (Switch Transformer §2.2).
    ``top_k ≥ 2``: GShard-style — gates renormalized over the selected
    experts; rank-r assignments are queued behind all ranks < r so primary
    assignments win capacity. Tokens past an expert's capacity are dropped
    (the residual path keeps them intact).

    ``aux`` is the Switch load-balancing loss (eq. 4): ``E · Σ_e f_e·P_e``
    with ``f_e`` the fraction of tokens whose PRIMARY assignment is expert
    ``e`` and ``P_e`` the mean router probability — ≥ 1, = 1 at perfect
    balance; differentiable through ``P``.
    """
    N, E = x.shape[0], cfg.num_experts
    C = cfg.capacity(N)
    probs = jax.nn.softmax(x @ params["router"], axis=-1)  # [N, E]
    k = cfg.top_k
    top_gates, top_experts = lax.top_k(probs, k)  # [N, k]
    if k > 1:
        top_gates = top_gates / jnp.maximum(
            top_gates.sum(-1, keepdims=True), 1e-9)
    onehots = jax.nn.one_hot(top_experts, E, dtype=x.dtype)  # [N, k, E]

    dispatch = jnp.zeros((N, E, C), x.dtype)
    combine = jnp.zeros((N, E, C), x.dtype)
    counts = jnp.zeros((E,), x.dtype)  # queue fill from previous ranks
    for r in range(k):
        oh = onehots[:, r, :]  # [N, E]
        pos = (jnp.cumsum(oh, axis=0) - 1.0) * oh + counts[None] * oh
        oh = oh * (pos < C)
        pos_oh = jax.nn.one_hot(
            (pos * oh).sum(-1).astype(jnp.int32), C, dtype=x.dtype)
        d = oh[:, :, None] * pos_oh[:, None, :]  # [N, E, C]
        dispatch = dispatch + d
        combine = combine + d * top_gates[:, r][:, None, None]
        counts = counts + onehots[:, r, :].sum(0)

    frac = onehots[:, 0, :].mean(0)  # primary-assignment fraction [E]
    aux = E * jnp.sum(frac * probs.mean(0))
    return dispatch, combine, aux


def _expert_ffn(w_in, w_out, h):
    """h [E', C, D] → [E', C, D] through per-expert SwiGLU-free GELU MLP."""
    u = jnp.einsum("ecd,edf->ecf", h, w_in)
    u = jax.nn.gelu(u, approximate=False)
    return jnp.einsum("ecf,efd->ecd", u, w_out)


def moe_ffn_dense_aux(params, x, cfg: MoEConfig):
    """Single-program reference: all experts computed locally. ``x``
    [N, D] → ([N, D], aux) (residual left to the caller; ``aux`` is the
    load-balancing loss — weight it with ``cfg.aux_weight``)."""
    dispatch, combine, aux = _route(params, x, cfg)
    h = jnp.einsum("nec,nd->ecd", dispatch, x)
    h = _expert_ffn(params["w_in"], params["w_out"], h)
    return jnp.einsum("nec,ecd->nd", combine, h), aux


def moe_ffn_dense(params, x, cfg: MoEConfig):
    """Back-compat wrapper of :func:`moe_ffn_dense_aux` (drops aux)."""
    return moe_ffn_dense_aux(params, x, cfg)[0]


def shard_moe_params(params, mesh: Mesh, axis: str = "model"):
    """Experts on the ``axis``; router replicated."""

    def place(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        spec = P(axis) if name in ("w_in", "w_out") else P()
        return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_moe_llama_params(params, mesh: Mesh, axis: str = "model"):
    """Expert-parallel placement for a MoE Llama decoder
    (``LlamaConfig.moe_experts > 0``): every stacked expert leaf
    (``w_in``/``w_out`` under a layer's ``"moe"``) is sharded on ``axis``;
    routers, attention, embedding, and head stay replicated. GSPMD then
    partitions the dispatch/expert/combine einsums over the expert axis —
    the dense formulation needs no shard_map."""

    def place(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        in_moe = any(
            (k.key if hasattr(k, "key") else str(k)) == "moe" for k in path)
        spec = P(axis) if (in_moe and name in ("w_in", "w_out")) else P()
        return jax.device_put(jnp.asarray(leaf), NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_moe_train_step(cfg: MoEConfig,
                        optimizer: optax.GradientTransformation,
                        mesh: Mesh, axis: str = "model"):
    """Jittable expert-parallel training step on a toy regression loss.

    The MoE layer runs inside ``shard_map``: each device applies only its
    local expert shard; the combine is one ``psum`` over ``axis``.
    Returns ``(step, loss_fn, forward)``. Routing (capacity + queue
    positions) is computed PER data shard — ``forward`` equals
    :func:`moe_ffn_dense` applied independently to each data-shard chunk,
    not to the global batch (capacity-drop behavior therefore depends on
    the dp degree, as in any local-routing MoE).
    """
    S = mesh.shape[axis]
    E_local = cfg.num_experts // S
    if cfg.num_experts % S:
        raise ValueError(f"{cfg.num_experts} experts not divisible by "
                         f"{axis}={S}")

    def ep_fn(router, w_in, w_out, x):
        # shard_map locals: w_in/w_out [E/S, ...]; x [N_local, D]
        idx = lax.axis_index(axis)
        dispatch, combine, _ = _route({"router": router}, x, cfg)
        lo = idx * E_local
        d_local = lax.dynamic_slice_in_dim(dispatch, lo, E_local, axis=1)
        c_local = lax.dynamic_slice_in_dim(combine, lo, E_local, axis=1)
        h = jnp.einsum("nec,nd->ecd", d_local, x)
        h = _expert_ffn(w_in, w_out, h)
        out = jnp.einsum("nec,ecd->nd", c_local, h)
        return lax.psum(out, axis)

    def forward(params, x):
        return jax.shard_map(
            ep_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis), P("data")),
            out_specs=P("data"),
            check_vma=False,
        )(params["router"], params["w_in"], params["w_out"], x)

    def loss_fn(params, x, y):
        pred = x + forward(params, x)  # residual MoE block
        return jnp.mean((pred - y) ** 2)

    def step(params, opt_state, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, loss_fn, forward
