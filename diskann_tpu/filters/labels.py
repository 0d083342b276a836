"""Per-point label storage as a dense device bitset.

Replaces the roaring-bitmap posting lists + inverted index of the reference
(`diskann-label-filter/src/set/roaring_set.rs`, `kv_index/*`): on TPU the
natural layout is one bitset row per point (``[cap, n_words] uint32``), so a
label test for a ``[B, C]`` candidate batch is one row gather + bit ops.
An inverted view (`members`) is still available for analytics/groundtruth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class LabelSet:
    """Mutable label assignment for up to `capacity` points."""

    def __init__(self, capacity: int, vocab: dict[str, int] | None = None,
                 n_words: int = 4):
        self.capacity = capacity
        self.vocab: dict[str, int] = dict(vocab or {})
        self.n_words = n_words
        self.bits = jnp.zeros((capacity, n_words), jnp.uint32)
        self.version = 0   # bumped on every mutation (cache invalidation)

    @classmethod
    def from_lists(cls, labels_per_point: list[list[str]], capacity: int | None = None):
        """Build from per-point label lists (the JSONL ingestion shape,
        `diskann-label-filter/src/utils/jsonl_reader.rs`)."""
        n = len(labels_per_point)
        capacity = capacity or n
        vocab: dict[str, int] = {}
        for ls in labels_per_point:
            for l in ls:
                if l not in vocab:
                    vocab[l] = len(vocab)
        n_words = max(1, -(-len(vocab) // 32))
        out = cls(capacity, vocab, n_words)
        rows = np.zeros((capacity, n_words), np.uint32)
        for i, ls in enumerate(labels_per_point):
            for l in ls:
                b = vocab[l]
                rows[i, b // 32] |= np.uint32(1 << (b % 32))
        out.bits = jnp.asarray(rows)
        return out

    def _bit(self, label: str) -> int:
        if label not in self.vocab:
            raise KeyError(f"unknown label {label!r}")
        return self.vocab[label]

    def add_label(self, label: str) -> int:
        if label in self.vocab:
            return self.vocab[label]
        b = len(self.vocab)
        if b >= self.n_words * 32:
            # grow word capacity
            extra = self.n_words
            self.bits = jnp.pad(self.bits, ((0, 0), (0, extra)))
            self.n_words += extra
        self.vocab[label] = b
        return b

    def set_labels(self, ids: np.ndarray, labels_per_id: list[list[str]]):
        # grow the vocab FIRST (a mid-loop word-growth would outdate rows),
        # then build the bit rows host-side at the final width — one device
        # scatter, no device->host round trip
        for ls in labels_per_id:
            for l in ls:
                self.add_label(l)
        rows = np.zeros((len(labels_per_id), self.n_words), np.uint32)
        for j, ls in enumerate(labels_per_id):
            for l in ls:
                b = self.vocab[l]
                rows[j, b // 32] |= np.uint32(1 << (b % 32))
        self.bits = self.bits.at[jnp.asarray(ids, jnp.int32)].set(
            jnp.asarray(rows), mode="drop"
        )
        self.version += 1

    def test(self, label: str, ids: jax.Array) -> jax.Array:
        """Device bit-test: which of `ids` carry `label`."""
        b = self._bit(label)
        word, bit = b // 32, b % 32
        safe = jnp.clip(ids, 0, self.capacity - 1)
        w = self.bits[safe, word]
        return ((w >> jnp.uint32(bit)) & 1).astype(jnp.bool_) & (ids >= 0)

    def members(self, label: str) -> np.ndarray:
        """Inverted-index view: ids carrying `label` (host-side)."""
        b = self._bit(label)
        word, bit = b // 32, b % 32
        col = np.asarray(self.bits[:, word])
        return np.nonzero((col >> bit) & 1)[0]
