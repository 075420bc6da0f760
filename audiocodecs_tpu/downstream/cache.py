"""Host-side codec token cache.

Capability parity with the reference's ``_CACHE``/``cache_bs{B}.pt``
mechanism (reference ``train_asr.py:36,46-64,137-140,256-261``): frozen-codec
token grids are memoized so epochs after the first skip codec encode
entirely. Keys are per-utterance IDs (the reference keys on sorted batch-ID
tuples, which breaks when batch composition changes — per-utterance keying
is strictly more reusable); persistence is one ``.npz`` per cache.

Disabled automatically when augmentation is active (same rule as the
reference, ``train_asr.py:50-64``).
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["TokenCache"]


class TokenCache:
    def __init__(self, path: str | None = None, max_items: int | None = None):
        self.path = path
        self.max_items = max_items
        self._store: dict[str, np.ndarray] = {}
        if path and os.path.exists(path):
            with np.load(path) as data:
                self._store = {k: data[k] for k in data.files}

    def get_batch(self, ids: list[str]):
        """All-or-nothing batch lookup → stacked [B, N, K] or None.

        Per-utterance token lengths vary; entries are stored unpadded and
        padded to the batch max on assembly (padding token 0 + the true
        lengths are re-derivable from the stored shapes).
        """
        if any(i not in self._store for i in ids):
            return None
        toks = [self._store[i] for i in ids]
        N = max(t.shape[0] for t in toks)
        out = np.zeros((len(toks), N, toks[0].shape[1]), toks[0].dtype)
        for b, t in enumerate(toks):
            out[b, : t.shape[0]] = t
        return out

    def put_batch(self, ids: list[str], toks, tok_lengths=None):
        """Store per-utterance slices of a padded [B, N, K] grid."""
        toks = np.asarray(toks)
        for b, i in enumerate(ids):
            if self.max_items is not None and len(self._store) >= self.max_items:
                return
            n = toks.shape[1]
            if tok_lengths is not None:
                n = int(round(float(tok_lengths[b]) * toks.shape[1]))
            self._store[i] = toks[b, :n].copy()

    def __len__(self):
        return len(self._store)

    def __contains__(self, key):
        return key in self._store

    def save(self, path: str | None = None):
        path = path or self.path
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            np.savez(path, **self._store)
