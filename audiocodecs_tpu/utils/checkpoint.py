"""Param pytree save/load.

Two formats:
  * ``.npz`` — flat key/value store for converted checkpoints (portable,
    no framework dependency).
  * Orbax — for training state (used by the downstream trainer; mirrors the
    reference's SpeechBrain ``Checkpointer`` role, reference
    ``tasks/asr.yaml:180-185``).
"""

from __future__ import annotations

import numpy as np

__all__ = ["save_params", "load_params", "flatten_pytree", "unflatten_pytree"]

_SEP = "::"
_EMPTY_DICT = "__empty_dict__"
_EMPTY_LIST = "__empty_list__"


def flatten_pytree(tree, prefix=""):
    """Nested dict/list pytree → flat {path: ndarray}. Empty containers
    are preserved via sentinel keys (they would otherwise vanish from the
    roundtrip and surprise consumers with missing keys)."""
    out = {}
    if isinstance(tree, dict):
        if not tree:
            out[f"{prefix}{_SEP}{_EMPTY_DICT}" if prefix else _EMPTY_DICT] = (
                np.zeros((), np.int8))
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{_SEP}{k}" if prefix else str(k)))
    elif isinstance(tree, (list, tuple)):
        if not tree:
            out[f"{prefix}{_SEP}{_EMPTY_LIST}" if prefix else _EMPTY_LIST] = (
                np.zeros((), np.int8))
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{_SEP}#{i}" if prefix else f"#{i}"))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_pytree(flat: dict):
    """Inverse of :func:`flatten_pytree` (lists recovered from ``#i`` keys)."""
    root: dict = {}
    for path, value in flat.items():
        keys = path.split(_SEP)
        node = root
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    def fix(node):
        if isinstance(node, dict):
            if _EMPTY_DICT in node:
                return {}
            if _EMPTY_LIST in node:
                return []
            if node and all(k.startswith("#") for k in node):
                return [fix(node[f"#{i}"]) for i in range(len(node))]
            return {k: fix(v) for k, v in node.items()}
        return node

    return fix(root)


def save_params(path: str, params) -> None:
    np.savez(path, **flatten_pytree(params))


def load_params(path: str):
    with np.load(path) as data:
        return unflatten_pytree({k: data[k] for k in data.files})


def save_train_state_orbax(directory: str, state) -> None:
    """Persist full training state (params + optimizer + counters) via Orbax
    (the TPU-native checkpointer; role of the reference's SpeechBrain
    ``Checkpointer``, reference ``tasks/asr.yaml:180-185``). ``state`` is any
    pytree, including optax states."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os

        ckptr.save(os.path.abspath(directory), state, force=True)


def load_train_state_orbax(directory: str, abstract_state=None):
    """Restore a pytree saved by :func:`save_train_state_orbax`."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        import os

        return ckptr.restore(os.path.abspath(directory), abstract_state)
