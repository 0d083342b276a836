"""Deterministic fault-injecting test scorers (the "pedantic provider").

The reference algorithm crate ships a DashMap-backed test provider that
counts accesses and injects TRANSIENT errors so every algorithm proves it
degrades instead of corrupting (`diskann/src/graph/test/provider.rs:1-70`,
access counters `diskann/src/graph/internal/counter.rs`).  Errors are ranked
transient-vs-hard (`diskann/src/error/ranked.rs`) and the algorithms choose
`allow_transient`: prune drops candidates whose vector fetch failed
(`diskann/src/graph/internal/prune.rs:93-174`), delete treats a transient
status as already-deleted (`index.rs:1279-1282`).

TPU analogue: a `ScorerDef` wrapper whose score/expand deterministically
"fails" a pseudo-random fraction of id fetches per call.  A failed fetch
surfaces exactly like the reference's allow_transient path: the candidate
is dropped from this hop (distance inf / id -1), never fabricated.  The
failure set is a hash of (id, salt), so runs are reproducible and tests can
turn the SAME ids on and off across calls (a retry succeeding is just a
different salt).

This module is import-light and test-oriented, but lives in the package
(like the reference's feature-gated `testing` module) so downstream users
can fault-inject their own compositions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from diskann_tpu.graph.scorers import ScorerDef

_KNUTH = jnp.uint32(2654435761)


def _fail_mask(ids: jax.Array, fail_permille: int, salt: int) -> jax.Array:
    """Deterministic per-id failure decision: hash(id, salt) < threshold.
    Invalid ids (< 0) are never 'failed' — they are already absent."""
    h = (ids.astype(jnp.uint32) ^ jnp.uint32(salt)) * _KNUTH
    bucket = (h >> jnp.uint32(16)) % jnp.uint32(1000)
    return (bucket < jnp.uint32(fail_permille)) & (ids >= 0)


@dataclasses.dataclass
class FaultStats:
    """Host-side access/failure counters (the test provider's counters)."""

    score_calls: int = 0
    expand_calls: int = 0
    failed: int = 0            # ids dropped by injection (host-synced)


def faulty_scorer(
    base_def: ScorerDef,
    base_data,
    *,
    fail_fraction: float,
    salt: int = 0,
    stats: FaultStats | None = None,
):
    """Wrap a scorer so a deterministic `fail_fraction` of id fetches fail
    transiently (distance inf -> the search/prune drops them this call).

    Returns (ScorerDef, data) usable anywhere the base scorer is.  The
    wrapper is exact for the surviving ids: distances of non-failed
    candidates are bitwise the base scorer's.
    """
    permille = int(round(fail_fraction * 1000))
    if not 0 <= permille <= 1000:
        raise ValueError(f"fail_fraction must be in [0, 1], got {fail_fraction}")

    def score(data, q_ctx, ids, valid):
        if stats is not None:
            stats.score_calls += 1
        fail = _fail_mask(ids, permille, salt)
        d = base_def.score(data, q_ctx, ids, valid & ~fail)
        return jnp.where(fail, jnp.inf, d)

    expand = None
    if base_def.expand is not None:
        def expand(data, q_ctx, beam_ids, beam_valid):
            if stats is not None:
                stats.expand_calls += 1
            # a failed fetch of a beam node's row loses its whole
            # neighborhood this hop (the sector-read failure shape)
            fail_row = _fail_mask(beam_ids, permille, salt)
            cand, d = base_def.expand(data, q_ctx, beam_ids,
                                      beam_valid & ~fail_row)
            b, w = beam_ids.shape
            c = cand.shape[1]
            rpn = c // w
            row_fail = jnp.repeat(fail_row, rpn, axis=1)
            cand = jnp.where(row_fail, -1, cand)
            d = jnp.where(row_fail, jnp.inf, d)
            # and individual candidate fetches can fail too
            cfail = _fail_mask(cand, permille, salt ^ 0x5A5A)
            return jnp.where(cfail, -1, cand), jnp.where(cfail, jnp.inf, d)

    wrapped = ScorerDef(
        name=f"faulty({base_def.name},{permille}/1000,salt={salt})",
        prep=base_def.prep,
        score=score,
        expand=expand,
    )
    return wrapped, base_data


def count_failed(ids, fail_fraction: float, salt: int = 0) -> int:
    """How many of `ids` the injector would fail (test assertion helper)."""
    import numpy as np

    m = _fail_mask(jnp.asarray(np.asarray(ids, np.int32)),
                   int(round(fail_fraction * 1000)), salt)
    return int(jnp.sum(m))
