"""Device mesh + sharding utilities (replaces the reference's DDP layer).

The reference delegates distribution to SpeechBrain/torch DDP
(``ddp_init_group``, rank-0 gating — reference ``train_asr.py:213-214``,
``utils.py:82-83``). Here distribution is first-class and TPU-native:

  * one ``jax.sharding.Mesh`` with ``(data, model)`` axes — data parallelism
    shards the batch across chips (ICI intra-slice, DCN across slices, chosen
    by XLA), model parallelism shards wide channel/vocab axes.
  * ``pjit``/``jax.jit`` with ``NamedSharding`` constraints; XLA inserts the
    collectives (psum for grads, all-gather for replicated reads).
  * host gating mirrors ``run_on_main`` via ``is_main_process()``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
    "is_main_process",
    "local_batch_slice",
    "P",
]


def init_distributed(coordinator_address=None, num_processes=None,
                     process_id=None) -> None:
    """Multi-host initialization (replaces the reference's
    ``ddp_init_group``/``--distributed_launch``, ``train_asr.py:213-214``).

    On TPU pods the arguments are auto-discovered from the environment; call
    once at program start before any jax op. No-op if already initialized or
    single-process.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # Tolerate ONLY the benign cases. A genuine multi-host init
        # failure (bad coordinator address, connection timeout) must not
        # degrade silently to process_count()==1 — every host would then
        # think it is main, train on the full data, and overwrite the
        # same checkpoints.
        msg = str(e).lower()
        benign = ("already initialized" in msg
                  or "is not defined" in msg  # no cluster env detected
                  or (coordinator_address is None
                      and num_processes in (None, 1)))
        if not benign:
            raise

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
    backend: Optional[str] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the first ``n_devices`` devices.

    ``model_parallel`` chips are grouped on the fastest (innermost) axis so
    model-parallel collectives ride nearest-neighbor ICI links.

    ``backend`` selects the device platform (e.g. ``"cpu"`` for virtual-device
    dry runs under ``--xla_force_host_platform_device_count`` even when a TPU
    is the default backend); ``None`` uses the default platform's devices.
    """
    devices = jax.devices(backend) if backend else jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if len(devices) < n_devices:
        raise ValueError(
            f"requested {n_devices} devices but backend "
            f"{backend or 'default'} has only {len(devices)}"
        )
    if n_devices % model_parallel:
        raise ValueError(f"{n_devices} devices not divisible by mp={model_parallel}")
    grid = np.asarray(devices[:n_devices]).reshape(
        n_devices // model_parallel, model_parallel
    )
    return Mesh(grid, axis_names)


def data_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis, replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays with batch-axis sharding."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def is_main_process() -> bool:
    """Rank-0 gating for checkpoint/metric writes (reference
    ``if_main_process``, ``train_asr.py:158``)."""
    return jax.process_index() == 0


def local_batch_slice(global_batch: int) -> slice:
    """This host's slice of a globally-sharded batch (multi-host feeding)."""
    per = global_batch // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)
