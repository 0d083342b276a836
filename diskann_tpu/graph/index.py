"""GraphIndex — the user-facing Vamana index facade.

Replaces the reference's `DiskANNIndex` + in-memory provider stack
(`diskann/src/graph/index.rs:58`, `diskann-inmem/src/provider.rs`).  The host
side only orchestrates: capacity growth, batch padding, start-point upkeep;
every hot operation is a jitted batched kernel over the `GraphArrays` pytree.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph import state as graph_state
from diskann_tpu.graph.build import insert_batch
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.search import beam_search
from diskann_tpu.ops.distance import Metric


class SearchStats(NamedTuple):
    """Aggregated search statistics (reference `SearchStats`, index.rs:89-102)."""

    cmps: np.ndarray     # [B] distance computations per query
    hops: np.ndarray     # [B] nodes expanded per query
    result_count: np.ndarray


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _encode_i8pack(q: np.ndarray) -> np.ndarray:
    """Host-side int8 query wire: per-row symmetric SQ (max-abs -> 127)
    with the f32 scale riding as 4 extra i8 columns -> [B, d+4] i8.

    The relay upload runs ~54MB/s and is ON the search critical path
    (doubling query bytes measured -35% QPS, /tmp/r5_battery3.log round
    "pflat_qf32") — int8 halves the f16 wire again.  The device
    reconstructs q = codes * scale (error ~0.4%/dim; the int8 traversal
    scorer re-quantizes q anyway, so only the exact rerank sees it)."""
    scale = np.abs(q).max(axis=1, keepdims=True).astype(np.float32) / 127.0
    scale = np.maximum(scale, 1e-12)
    qi = np.clip(np.rint(q / scale), -127, 127).astype(np.int8)
    return np.concatenate([qi, scale.view(np.int8)], axis=1)


def _decode_i8pack(q_wire, dim: int):
    """Device-side inverse of `_encode_i8pack` -> [B, d] f32."""
    codes = q_wire[:, :dim].astype(jnp.float32)
    scale = jax.lax.bitcast_convert_type(
        q_wire[:, dim : dim + 4], jnp.float32
    )
    return codes * scale[:, None]


# mode="auto" flat-vs-graph crossover, in live_n * dim elements.  Measured
# endpoints (BENCH_WIKI100K_r04.json): at 100k x 768 = 76.8M the exact bf16
# MXU scan wins (5,647 QPS @ recall 1.0 vs graph 4,101 @ 0.9993); at
# 1M x 128 = 128M the graph wins by ~25x (89,681 QPS).  The scan's cost is
# linear in N*d, so the crossover sits between those points.
FLAT_AUTO_CROSSOVER = 100_000_000


@partial(jax.jit, static_argnames=("flat",))
def _pack_outputs(fd, fi, cmps, hops, flat: bool = False):
    """Pack (dists f32 [B,k], ids i32 [B,k], cmps [B], hops [B]) into ONE
    [B, 2k+2] i32 array so a whole batch's results cross the host link in a
    single fetch (each independent fetch pays the ~30ms relay RTT).

    flat=True reshapes to exact [*, 128] lane tiles: a [B, 22] i32 output
    buffer tiles as (8, 128) on TPU — 22 minor-dim columns pad 5.8x, and
    the D2H fetch ships the padded tiles (measured 6.6ms for a [2048, 22]
    result vs the ~0.6ms its 180KB would cost; scripts/r5_profile.py)."""
    out = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(fd, jnp.int32),
            fi,
            cmps[:, None].astype(jnp.int32),
            hops[:, None].astype(jnp.int32),
        ],
        axis=1,
    )
    if flat:
        n = out.shape[0] * out.shape[1]
        pad = (-n) % 128
        out = jnp.pad(out.reshape(-1), (0, pad)).reshape(-1, 128)
    return out


def _unpack_outputs(arr: np.ndarray, k: int, b: int | None = None):
    w = 2 * k + 2
    if arr.ndim != 2 or arr.shape[1] != w:       # flat [*, 128] tiles
        arr = arr.reshape(-1)[: b * w].reshape(b, w)
    fd = np.ascontiguousarray(arr[:, :k]).view(np.float32)
    fi = arr[:, k : 2 * k]
    cmps = arr[:, 2 * k]
    hops = arr[:, 2 * k + 1]
    return fd, fi, cmps, hops


@partial(jax.jit, static_argnames=("metric", "k"))
def _rerank(ids, queries, vectors, sq_norms, valid, metric: Metric, k: int):
    """Re-score candidate ids with full-precision distances, sort, filter
    deleted, return top-k (the disk tier's rerank post-process)."""
    from diskann_tpu.ops.distance import distance_to_set, squared_norms as _sq

    cap = vectors.shape[0]
    ok = (ids >= 0) & valid[jnp.clip(ids, 0, cap - 1)]
    safe = jnp.clip(ids, 0, cap - 1)
    cvec = vectors[safe]
    csq = sq_norms[safe]
    qsq = _sq(queries) if metric.needs_norms else None
    d = distance_to_set(queries, cvec, metric, x_sq_norms=csq, q_sq_norms=qsq)
    d = jnp.where(ok, d, jnp.inf)
    iid = jnp.where(ok, ids, -1)
    d, iid = jax.lax.sort((d, iid), dimension=-1, num_keys=1)
    return d[:, :k], iid[:, :k]


@partial(jax.jit, static_argnames=("k",))
def _filter_deleted(dists, ids, valid, k: int):
    """Drop deleted ids from sorted result lists and compact to the first k
    live entries (the post-process `CopyIds`/filter step of the reference's
    search pipeline, `glue.rs:650-800`)."""
    cap = valid.shape[0]
    b, l = ids.shape
    ok = (ids >= 0) & valid[jnp.clip(ids, 0, cap - 1)]
    rank = jnp.cumsum(ok.astype(jnp.int32), axis=1) - 1
    slot = jnp.where(ok & (rank < k), rank, k)
    out_d = jnp.full((b, k), jnp.inf, dists.dtype)
    out_i = jnp.full((b, k), -1, ids.dtype)
    out_d = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out_d, slot, dists)
    out_i = jax.vmap(lambda o, p, v: o.at[p].set(v, mode="drop"))(out_i, slot, ids)
    return out_d, out_i


@partial(jax.jit, static_argnames=("metric", "k"))
def _member_scan(queries, member_ids, vectors, sq_norms, metric: Metric,
                 k: int):
    """Exact top-k over an explicit member set (-1 padded) — the
    posting-list evaluation path for selective filtered queries."""
    from diskann_tpu.ops.distance import distance_to_set, squared_norms as _sq

    cap = vectors.shape[0]
    ok = member_ids >= 0
    safe = jnp.clip(member_ids, 0, cap - 1)
    mv = vectors[safe]
    msq = sq_norms[safe]
    qsq = _sq(queries) if metric.needs_norms else None
    d = distance_to_set(queries, mv, metric, x_sq_norms=msq, q_sq_norms=qsq)
    d = jnp.where(ok[None, :], d, jnp.inf)
    ids = jnp.broadcast_to(member_ids[None, :], d.shape)
    d, ids = jax.lax.sort((d, ids), dimension=-1, num_keys=1)
    kk = min(k, d.shape[1])
    out_d = jnp.full((d.shape[0], k), jnp.inf, d.dtype).at[:, :kk].set(
        d[:, :kk]
    )
    out_i = jnp.full((d.shape[0], k), -1, jnp.int32).at[:, :kk].set(
        ids[:, :kk]
    )
    return out_d, jnp.where(jnp.isfinite(out_d), out_i, -1)


def _router_pick(d, router_ids, n_start: int):
    """Top-n_start router entries. approx_min_k over the [B, S] distance
    matrix: entry points only need to be NEAR-nearest (they seed a walk),
    and the approximate bucketed reduction skips the full row sort that
    lax.top_k pays on S=64k rows (recall delta unmeasurable on the 1M
    bench; the reference's start-point strategies are random/medoid
    samples anyway, `start_point.rs:19-41`)."""
    if d.shape[1] <= 1024:
        _, top = jax.lax.top_k(-d, n_start)
    else:
        _, top = jax.lax.approx_min_k(d, n_start)
    return router_ids[top]


@partial(jax.jit, static_argnames=("metric", "n_start"))
def _router_topk_full(vectors, sq_norms, router_ids, queries,
                      metric: Metric, n_start: int):
    """[B, d] queries x [S] router ids -> [B, n_start] nearest router ids."""
    rv = vectors[router_ids]                      # [S, d]
    rsq = sq_norms[router_ids]
    return _router_topk_full_pre(rv, rsq, router_ids, queries, metric, n_start)


def _router_topk_full_pre(rv, rsq, router_ids, queries,
                          metric: Metric, n_start: int):
    """Full-precision router over PRE-GATHERED rows (see `_router_rows`)."""
    d = _router_dist(queries, rv, rsq, metric)
    return _router_pick(d, router_ids, n_start)


def _router_dist(queries, rv, rsq, metric: Metric):
    q = queries.astype(jnp.float32)
    dots = q @ rv.astype(jnp.float32).T               # [B, S] one MXU matmul
    if metric == Metric.InnerProduct:
        return -dots
    qsq = jnp.sum(q * q, axis=-1, keepdims=True)
    return qsq + rsq[None, :] - 2.0 * dots


@partial(jax.jit, static_argnames=("metric", "n_start"))
def _router_topk_packed(self_codes, self_aux, proj, pscale, pbias2,
                        router_ids, queries, metric: Metric, n_start: int):
    """Router scored on int8 packed codes (one int8 MXU matmul)."""
    rc = self_codes[router_ids]                       # [S, dp] i8
    raux = self_aux[router_ids]
    return _router_topk_packed_pre(
        rc, raux, proj, pscale, pbias2, router_ids, queries, metric, n_start
    )


def _router_topk_packed_pre(rc, raux, proj, pscale, pbias2, router_ids,
                            queries, metric: Metric, n_start: int,
                            compute: str = "int8"):
    """Packed router over PRE-GATHERED code rows.

    The [S, dp] row gather is issue-bound like every row gather on this
    target; hoisting it to router-refresh time (`GraphIndex._router_rows`)
    removes it from every composed search dispatch.
    compute="int8": exact historical math (query quantized to int8, MXU
    int8 matmul, f32 epilogue — materializes an i32 [B, S]).
    compute="bf16": bf16 MXU matmul of the scaled query against bf16-cast
    codes — halves the [B, S] HBM materialization; entry points only need
    to be near-nearest so the ~0.4% relative rounding is recall-neutral
    (A/B'd on the 1M bench before becoming a default)."""
    q = queries.astype(jnp.float32) @ proj
    qb = q - pbias2[None, :] if metric.needs_norms else q
    qs = qb * pscale[None, :]
    if compute == "bf16":
        dots = jax.lax.dot_general(
            qs.astype(jnp.bfloat16), rc.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        if metric == Metric.InnerProduct:
            d = -dots
        else:
            qsq = jnp.sum(qb * qb, axis=-1, keepdims=True)
            d = (qsq.astype(jnp.bfloat16) + raux[None, :].astype(jnp.bfloat16)
                 - 2.0 * dots)
        return _router_pick(d, router_ids, n_start)
    qscale = jnp.maximum(jnp.abs(qs).max(axis=1), 1e-20) / 127.0
    qi = jnp.clip(jnp.round(qs / qscale[:, None]), -127, 127).astype(jnp.int8)
    dots = jax.lax.dot_general(
        qi, rc, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    ).astype(jnp.float32) * qscale[:, None]
    if metric == Metric.InnerProduct:
        d = -dots
    else:
        qsq = jnp.sum(qb * qb, axis=-1, keepdims=True)
        d = qsq + raux[None, :] - 2.0 * dots
    return _router_pick(d, router_ids, n_start)


@jax.jit
def _cast_f32(q):
    """Device-side upcast of a compressed query upload (one tiny dispatch;
    keeps every downstream jit specialized on f32 inputs)."""
    return q.astype(jnp.float32)


class GraphIndex:
    """A dynamic Vamana graph index on TPU."""

    def __init__(
        self,
        dim: int,
        config: GraphConfig | None = None,
        *,
        capacity: int = 1024,
        dtype=jnp.float32,
        insert_batch_size: int = 1024,
        search_batch_size: int = 1024,
        build_backedge_src_cap: int = 64,
    ):
        self.config = config or GraphConfig()
        self.dim = dim
        self.dtype = dtype
        self.insert_batch_size = insert_batch_size
        self.search_batch_size = search_batch_size
        # per-overfull-target cap on batch backedge sources entering the
        # re-prune pool (phase 3c); the pool gather is row-issue-bound so
        # cost is linear in (R_slack + this)
        self.build_backedge_src_cap = build_backedge_src_cap
        self.n = 0
        self.n_deleted = 0
        self.packed = None
        self.free_slots: list[int] = []
        self._start_ids: jax.Array | None = None
        self.state = graph_state.alloc(
            _round_up(capacity, insert_batch_size),
            dim,
            self.config.max_degree_with_slack,
            dtype=dtype,
        )
        self.last_insert_stats: dict | None = None

    # ------------------------------------------------------------------ build
    @classmethod
    def build(
        cls,
        vectors,
        config: GraphConfig | None = None,
        *,
        dtype=jnp.float32,
        insert_batch_size: int = 1024,
        build_mode: str = "full",
        packed_dp: int = 64,
        capacity: int | None = None,
        **kwargs,
    ) -> "GraphIndex":
        """Bulk-build an index over `vectors` via batched multi_insert.

        build_mode="packed" maintains the packed int8 neighbor-code layout
        incrementally and uses it for candidate generation — much faster
        build at scale (row-count-bound gathers drop by R x), with prune
        decisions still full-precision.  The packed layout then also serves
        `search(mode="packed")` with no extra attach step.

        `vectors` may be a device-resident jax.Array (e.g. generated on
        device): batches are then sliced on device and never cross the host
        link (the relay runs ~54 MB/s, so a 1M x 128 f32 round trip costs
        ~20s of pure transfer)."""
        if not isinstance(vectors, jax.Array):
            vectors = np.asarray(vectors)
        n, dim = vectors.shape
        # an explicit capacity (> n) lets callers UNIFY array shapes across
        # many builds (e.g. merged shard builds) so compiled kernels are
        # shared instead of re-specialized per build
        idx = cls(
            dim,
            config,
            capacity=max(capacity or 0, n, insert_batch_size),
            dtype=dtype,
            insert_batch_size=insert_batch_size,
            **kwargs,
        )
        if build_mode == "packed":
            from diskann_tpu.graph import packed as packed_mod

            proj, pscale, pbias2 = packed_mod.train_packed(
                vectors[: 1 << 16], min(packed_dp, dim), idx.config.metric
            )
            idx.packed = packed_mod.alloc_packed(
                proj, pscale, pbias2, idx.state.capacity,
                idx.config.max_degree_with_slack,
            )
        idx.insert(vectors)
        return idx

    def _ensure_capacity(self, needed: int):
        cap = self.state.capacity
        if needed <= cap:
            return
        new_cap = _round_up(max(needed, int(cap * 1.5)), self.insert_batch_size)
        self.state = graph_state.grow(self.state, new_cap)
        if self.packed is not None:
            from diskann_tpu.graph import packed as packed_mod

            self.packed = packed_mod.grow_packed(self.packed, new_cap)
        # grow any quantized attachments alongside (streaming adds encode
        # into these rows incrementally — see service backfill)
        extra = new_cap - cap
        pad2 = lambda a: jnp.pad(a, ((0, extra), (0, 0)))
        pad1 = lambda a, v=0.0: jnp.pad(a, (0, extra), constant_values=v)
        if getattr(self, "pq", None) is not None:
            self.pq_codes = pad2(self.pq_codes)
        if getattr(self, "sq", None) is not None:
            self.sq_codes = pad2(self.sq_codes)
            self.sq_aux = pad1(self.sq_aux)
        if getattr(self, "sph", None) is not None:
            self.sph_words = pad2(self.sph_words)
            self.sph_norms = pad1(self.sph_norms)
            self.sph_cscale = pad1(self.sph_cscale)
        if getattr(self, "mm", None) is not None:
            self.mm_codes = pad2(self.mm_codes)
            self.mm_lo = pad1(self.mm_lo)
            self.mm_step = pad1(self.mm_step, 1.0)
            self.mm_aux = pad1(self.mm_aux)
        if getattr(self, "labels", None) is not None:
            self.labels.bits = jnp.pad(self.labels.bits, ((0, extra), (0, 0)))
            self.labels.capacity = new_cap

    _cached_start: jax.Array | None = None
    _auto_start: jax.Array | None = None
    _router_ids: jax.Array | None = None

    _start_strategy = ("medoid", 1, 0)

    def set_start_strategy(self, strategy: str = "medoid", k: int = 1,
                           seed: int = 0) -> None:
        """Pick the walk's entry-point strategy — the reference's
        `StartPointStrategy` family (`start_point.rs:19-41`): "medoid"
        (default) | "first_vector" | "random_samples" | "latin_hypercube"
        | "random_vectors".  Re-derived automatically after inserts/deletes
        (the same invalidation as the medoid)."""
        if strategy not in ("medoid", "first_vector", "random_samples",
                            "latin_hypercube", "random_vectors"):
            raise ValueError(f"unknown start strategy {strategy!r}")
        if strategy == "random_vectors" and getattr(
            self, "_hbm_vectors_dropped", False
        ):
            raise ValueError("random_vectors needs full vectors in HBM")
        self._start_strategy = (strategy, k, seed)
        self._invalidate_start()

    def _start(self) -> jax.Array:
        if self._cached_start is not None:
            return self._cached_start  # pinned (e.g. tiered drop of vectors)
        if self.n_live <= 0:
            return jnp.full((1,), -1, jnp.int32)
        if self._auto_start is None:
            strat, k, seed = self._start_strategy
            if strat == "medoid":
                self._auto_start = graph_state.medoid(
                    self.state, jnp.int32(self.n_live)
                )[None]
            else:
                self._auto_start = graph_state.start_ids(
                    self.state, self.n, strat, k, seed
                )
        return self._auto_start

    def _invalidate_start(self):
        self._auto_start = None
        self._router_ids = None
        self._router_rows_cache = None
        self._flat_bf16 = None  # mode="auto" scan cache follows mutations

    def _router_starts(self, q_dev, mode: str,
                       n_start: int | None = None) -> jax.Array | None:
        """Per-query entry points: ONE matmul of the query batch against a
        sampled router set, take the `router_starts` nearest (replaces the
        medoid descent; reference start-point strategies live in
        `diskann/src/graph/start_point.rs:19-41` — this is the TPU-native
        strategy: the matmul is nearly free on the MXU and cuts the early
        hops every query spends walking down from one global medoid)."""
        cfg = self.config
        size = min(cfg.router_size, self.n_live // 4)
        if cfg.router_size <= 0 or size < 64:
            return None
        if self._cached_start is not None and mode not in ("packed",):
            return None
        if self._router_ids is None:
            valid = np.asarray(self.state.valid[: self.n])
            live = np.nonzero(valid)[0]
            rng = np.random.default_rng(0xD15C)
            sel = rng.choice(live, size=min(size, len(live)), replace=False)
            self._router_ids = jnp.asarray(np.sort(sel).astype(np.int32))
        # None/0 both mean "use the config default" (documented in search());
        # negative values would reach lax.top_k and die with an opaque XLA
        # error, so reject them here
        ns = n_start if n_start else cfg.router_starts
        if ns < 1:
            raise ValueError(f"router_starts must be >= 1, got {ns}")
        ns = min(ns, int(self._router_ids.shape[0]))
        if mode == "packed" or getattr(self, "_hbm_vectors_dropped", False):
            return _router_topk_packed(
                self.packed.self_codes, self.packed.self_aux,
                self.packed.proj, self.packed.pscale, self.packed.pbias2,
                self._router_ids, q_dev, self.config.metric, ns,
            )
        return _router_topk_full(
            self.state.vectors, self.state.sq_norms, self._router_ids,
            q_dev, self.config.metric, ns,
        )

    # ----------------------------------------------------------------- insert
    def insert(self, vectors) -> np.ndarray:
        """Insert a batch of vectors; returns their assigned internal ids.

        Mirrors `DiskANNIndex::multi_insert` (index.rs:815): the batch is cut
        into fixed-size minibatches, each committed with the 3-phase batched
        kernel in `diskann_tpu.graph.build`.  Freed slots (from deletes) are
        recycled first, like the reference's freelist
        (`diskann-inmem/src/freelist.rs`).
        """
        on_device = isinstance(vectors, jax.Array)
        if on_device:
            if vectors.ndim == 1:
                vectors = vectors[None]
            vectors = vectors.astype(jnp.float32)
        else:
            vectors = np.asarray(vectors, dtype=np.float32)
            if vectors.ndim == 1:
                vectors = vectors[None]
        m_total = vectors.shape[0]

        # assign slots: freelist first, then fresh ones at the high-water mark
        reuse = min(len(self.free_slots), m_total)
        slots = np.empty((m_total,), np.int64)
        for j in range(reuse):
            slots[j] = self.free_slots.pop()
        fresh = m_total - reuse
        slots[reuse:] = np.arange(self.n, self.n + fresh)
        self._ensure_capacity(self.n + _round_up(fresh, self.insert_batch_size))

        from diskann_tpu.trace import span

        bs = self.insert_batch_size
        totals = None      # device-scalar (cmps, hops) accumulators
        sync_q = []        # one-behind sync handles (bound in-flight batches)
        self._invalidate_start()  # one medoid refresh per insert call
        # Build-side router entry points: once enough nodes are committed
        # (>= 4 x router_size, so the sampled-set shape is constant and the
        # kernel compiles exactly twice: unrouted + routed), candidate
        # searches start from per-query nearest router nodes instead of the
        # medoid.  The table is re-gathered every 16 batches (ids sampled
        # host-side from the committed id range; a stale/deleted entry is
        # harmless — it's just an entry point).
        base_n = self.n
        r_size = self.config.router_size
        use_router = (
            self.packed is not None
            and r_size > 0
            and self.config.router_starts > 0
        )
        router = None
        next_router_refresh = 0
        for bi, off in enumerate(range(0, m_total, bs)):
            chunk = vectors[off : off + bs]
            schunk = slots[off : off + bs].astype(np.int32)
            m = chunk.shape[0]
            if m < bs:
                pad2 = jnp.pad if on_device else np.pad
                chunk = pad2(chunk, ((0, bs - m), (0, 0)))
                schunk = np.pad(schunk, (0, bs - m), constant_values=-1)
            row_valid = jnp.arange(bs) < m
            committed = base_n + off
            if use_router and committed >= 4 * r_size and bi >= next_router_refresh:
                rng_r = np.random.default_rng(0xD15C ^ committed)
                rids = np.sort(
                    rng_r.choice(committed, size=r_size, replace=False)
                ).astype(np.int32)
                rids = jnp.asarray(rids)
                router = (
                    self.packed.self_codes[rids],
                    self.packed.self_aux[rids],
                    rids,
                )
                next_router_refresh = bi + 16
            with span("insert.batch", offset=off, rows=m):
                self.state, self.packed, stats = insert_batch(
                    self.state,
                    jnp.asarray(schunk),
                    jnp.asarray(chunk),
                    row_valid,
                    self._start(),
                    self.config,
                    self.packed,
                    backedge_src_cap=self.build_backedge_src_cap,
                    router=router,
                )
            self.n = max(self.n, int(schunk[:m].max()) + 1 if m else self.n)
            # accumulate stats ON DEVICE and sync one batch BEHIND: a
            # blocking int(fetch) here would serialize host batch prep with
            # device compute (~0.27s/batch of prep hidden by the overlap),
            # while never syncing would enqueue every batch's donated
            # transients at once (dispatch allocates outputs at enqueue —
            # CLAUDE.md).  Two batches in flight is the double-buffer.
            tc, th = stats.cmps.sum(), stats.hops.sum()
            totals = (
                (tc, th) if totals is None
                else (totals[0] + tc, totals[1] + th)
            )
            sync_q.append(th)
            if len(sync_q) > 1:
                np.asarray(sync_q.pop(0))  # the only real barrier on axon
        self.n_deleted -= reuse
        self.last_insert_stats = {
            "cmps": int(totals[0]) if totals is not None else 0,
            "hops": int(totals[1]) if totals is not None else 0,
        }
        return slots

    # ----------------------------------------------------------------- search
    def search(
        self,
        queries,
        k: int = 10,
        *,
        l_search: int | None = None,
        beam_width: int | None = None,
        mode: str = "full",
        rerank_l: int | None = None,
        max_hops: int | None = None,
        query_dtype=None,
        router_starts: int | None = None,
    ) -> tuple[np.ndarray, np.ndarray, SearchStats]:
        """k-NN search. Returns (dists [B,k], ids [B,k], stats).

        router_starts: override `config.router_starts` for this call — more
        per-query entry points make the initial list better (the router
        matmul is nearly free on the MXU) so the walk converges in fewer
        hops; pairs with a lower `max_hops`.

        mode="full": full-precision traversal (in-memory provider).
        mode="pq":   PQ-code traversal + full-precision rerank (the SSD-tier
                     flow on HBM; requires `attach_pq`).
        rerank_l (quant modes): rerank only the top `rerank_l` traversal
        candidates instead of all L — the HBM analogue of the disk tier's
        io_limit (`disk_provider.rs:683-722`); the rerank gather is row-
        issue-bound, so smaller budgets cut its cost proportionally.
        max_hops: cap beam iterations (batch-level early termination — the
        loop runs to the slowest query's convergence, so a cap just above
        the mean trades tail-query recall for batch time; reference
        analogue: io_limit early termination).

        Batches are DISPATCHED first and fetched after (device dispatch is
        async), and each batch's outputs cross the host link as one packed
        array — per-batch fetch RTT is paid once, overlapped with compute.
        query_dtype: wire dtype for the host->device query upload (e.g.
        jnp.float16).  The remote link runs at ~54 MB/s, so the f32 upload
        of a big batch costs more than the whole search loop; f16 halves it
        (cast back to f32 on device before any arithmetic).  Sub-batching
        (search_batch_size < B) overlaps upload i+1 with compute i."""
        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        if mode == "auto":
            # Flat-vs-graph routing (the reference keeps a standalone
            # FlatIndex for exactly this regime, `diskann/src/flat/mod.rs:6-30`):
            # below the measured N*d crossover the exact MXU scan beats the
            # walk at recall 1.0, so route there without the caller choosing;
            # above it, pick the best attached graph mode.
            live = max(self.n - self.n_deleted, 0)
            if (not getattr(self, "_hbm_vectors_dropped", False)
                    and live * self.dim <= FLAT_AUTO_CROSSOVER):
                return self._flat_auto_search(queries, k)
            mode = "packed" if self.packed is not None else "full"
        b = queries.shape[0]
        l = l_search if l_search is not None else max(k, self.config.l_build)
        l = max(l, k)
        w = beam_width if beam_width is not None else self.config.beam_width

        bs = min(self.search_batch_size, _round_up(b, 64))
        out_d = np.full((b, k), np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int32)
        cmps = np.zeros((b,), np.int32)
        hops = np.zeros((b,), np.int32)
        start = self._start()

        i8_wire = query_dtype in ("i8", "int8", "i8pack") or (
            query_dtype is not None and np.dtype(query_dtype) == np.int8
        )
        quant = mode in ("pq", "sq", "packed", "spherical", "minmax")
        if quant:
            # one dispatch per sub-batch: upload the (compressed) queries and
            # run the composed program (router + traversal + rerank + pack)
            router_ids = self._router_ids_live(mode)
            use_router = router_ids is not None
            fn = self._composed_quant_fn(
                mode, k, l, w, rerank_l, max_hops,
                "i8pack" if i8_wire
                else (np.dtype(query_dtype).name if query_dtype else None),
                use_router, router_starts,
            )
            _, sdata, _ = self._scorer_for_mode(mode)
            if use_router:
                router_codes = self._router_rows(
                    mode == "packed"
                    or getattr(self, "_hbm_vectors_dropped", False)
                )
            else:
                router_codes = ()
                router_ids = jnp.zeros((1,), jnp.int32)

        pending = []
        for off in range(0, b, bs):
            q = queries[off : off + bs]
            m = q.shape[0]
            if m < bs:
                q = np.pad(q, ((0, bs - m), (0, 0)))
            if quant:
                if i8_wire:
                    q_wire = jnp.asarray(_encode_i8pack(q))
                elif query_dtype is not None:
                    q_wire = jnp.asarray(q.astype(query_dtype))
                else:
                    q_wire = jnp.asarray(q)
                packed_out = fn(
                    q_wire, sdata, self.state.adjacency, self.state.vectors,
                    self.state.sq_norms, self.state.valid, router_ids,
                    router_codes, start,
                )
                # start the D2H copy now: it overlaps the NEXT sub-batch's
                # compute, so the final np.asarray finds the bytes already on
                # host (measured 124.8 -> 42.9 ms for a 4x[2048,22] result
                # set over the relay, scripts/profile_fetch.py)
                try:
                    packed_out.copy_to_host_async()
                except Exception:
                    pass
                pending.append((off, m, packed_out))
                continue
            if query_dtype is not None:
                q_dev = _cast_f32(jnp.asarray(q.astype(query_dtype)))
            else:
                q_dev = jnp.asarray(q)
            rstart = self._router_starts(q_dev, mode, router_starts)
            if mode == "full":
                res = beam_search(
                    self.state.vectors,
                    self.state.sq_norms,
                    self.state.adjacency,
                    rstart if rstart is not None else start,
                    q_dev,
                    metric=self.config.metric,
                    l_search=l,
                    beam_width=w,
                    max_hops=max_hops or self.config.max_hops,
                    history_capacity=self.config.history_capacity(l),
                )
                fd, fi = _filter_deleted(res.dists, res.ids, self.state.valid, k)
                packed_out = _pack_outputs(fd, fi, res.cmps, res.hops)
            else:
                raise ValueError(f"unknown search mode {mode!r}")
            try:
                packed_out.copy_to_host_async()
            except Exception:
                pass
            pending.append((off, m, packed_out))

        # outputs were async-copied to host right after each dispatch (see
        # copy_to_host_async above), so these np.asarray calls mostly find
        # local bytes; only the LAST sub-batch's copy can still be in flight
        arrs = [np.asarray(po) for _, _, po in pending]
        for i, (off, m, _) in enumerate(pending):
            fd, fi, cm, hp = _unpack_outputs(arrs[i], k, bs)
            out_d[off : off + m] = fd[:m]
            out_i[off : off + m] = fi[:m]
            cmps[off : off + m] = cm[:m]
            hops[off : off + m] = hp[:m]
        stats = SearchStats(
            cmps=cmps, hops=hops, result_count=(out_i >= 0).sum(axis=1)
        )
        return out_d, out_i, stats

    _flat_bf16 = None

    def _flat_auto_search(self, queries, k: int):
        """mode="auto" small-N escape hatch: exact bf16-shortlist + f32-rerank
        MXU scan over the live rows (the same two-pass kernel as
        `FlatIndex.search(compute="bf16")`, with the index's validity mask so
        deleted slots never surface).  Measured at the reference CI shape
        (100k x 768 IP): 5,647 QPS at recall 1.0 vs the graph walk's 4,101 at
        0.9993 (`BENCH_WIKI100K_r04.json`)."""
        from diskann_tpu.flat.index import _flat_search, _flat_search_bf16

        metric = self.config.metric
        cap = int(self.state.vectors.shape[0])
        b = queries.shape[0]
        qj = jnp.asarray(queries)
        chunk = min(max(8192, 1 << 14), cap)
        if metric == Metric.L1:
            d, i = _flat_search(
                qj, self.state.vectors, self.state.sq_norms, self.state.valid,
                metric=metric, k=k, chunk=min(2048, chunk), n=cap,
            )
        else:
            kc = min(max(4 * k, 64), cap)
            if self._flat_bf16 is None:
                self._flat_bf16 = self.state.vectors.astype(jnp.bfloat16)
            qc = max(min(b, (1 << 27) // max(kc * self.dim, 1)), 16)
            qc = min(qc, b)
            d, i = _flat_search_bf16(
                qj, self._flat_bf16, self.state.vectors, self.state.sq_norms,
                self.state.valid, metric=metric, k=k, kc=kc, chunk=chunk,
                n=cap, qc=qc,
            )
        d, i = np.asarray(d), np.asarray(i)
        live = max(self.n - self.n_deleted, 0)
        stats = SearchStats(
            cmps=np.full((b,), live, np.int32),
            hops=np.zeros((b,), np.int32),
            result_count=(i >= 0).sum(axis=1),
        )
        return d, i, stats

    # ------------------------------------------------------------- quantized
    def attach_pq(self, pq=None, *, n_chunks: int = 32, n_centers: int = 256,
                  seed: int = 0) -> None:
        """Attach (or train) a product quantizer and encode all current
        vectors.  Enables PQ-guided traversal (`search(mode="pq")`) — the
        HBM analogue of the SSD tier's PQ-in-RAM beam search
        (`diskann-disk/.../disk_provider.rs:634-654`): codes are ~16x
        smaller than f32 vectors, so each hop gathers 16x fewer bytes.

        n_centers=16 selects 4-bit PQ, whose ADC runs as a fused masked
        reduction instead of per-scalar LUT gathers (see
        `scorers._pq_score`) — on TPU that is orders of magnitude faster
        per hop than 8-bit PQ at equal code bytes (use 2x n_chunks for
        equal bits)."""
        from diskann_tpu.quant.pq import train_pq

        vecs = np.asarray(self.state.vectors[: self.n])
        if pq is None:
            pq = train_pq(jax.random.key(seed), vecs, n_chunks=n_chunks,
                          n_centers=n_centers)
        self.pq = pq
        codes = np.zeros((self.state.capacity, pq.n_chunks), np.uint8)
        codes[: self.n] = np.asarray(pq.encode(vecs))
        self.pq_codes = jnp.asarray(codes)

    def attach_sq(self, *, n_bits: int = 8, sigma: float = 4.0) -> None:
        """Train an int8 scalar quantizer and encode all current vectors.
        Enables SQ-guided traversal (`search(mode="sq")`) — 4x less gather
        bandwidth per hop than f32, with full-precision rerank on top
        (reference scalar quantizer: `diskann-quantization/src/scalar`)."""
        from diskann_tpu.graph.scorers import sq_aux_norms, sq_center_codes
        from diskann_tpu.quant.scalar import train_scalar

        vecs = np.asarray(self.state.vectors[: self.n])
        sq = train_scalar(vecs, n_bits=n_bits, sigma=sigma)
        self.sq = sq
        codes = np.full((self.state.capacity, self.dim), 128, np.uint8)
        codes[: self.n] = np.asarray(sq.encode(vecs))
        codes_i8, bias2 = sq_center_codes(jnp.asarray(codes), sq.scale, sq.bias)
        self.sq_codes = codes_i8
        self.sq_bias2 = bias2
        self.sq_aux = sq_aux_norms(codes_i8, sq.scale)

    def attach_minmax(self) -> None:
        """Encode all current vectors with the training-free per-vector
        MinMax quantizer and enable `search(mode="minmax")` — the streaming-
        workload quantizer (`diskann-quantization/src/minmax/quantizer.rs:69`
        — no training pass, so new inserts can be encoded immediately)."""
        from diskann_tpu.quant.minmax import MinMaxQuantizer

        mm = MinMaxQuantizer()
        self.mm = mm
        cap = self.state.capacity
        vecs = self.state.vectors[: self.n]
        codes, lo, step = mm.encode(vecs)
        codes_i8 = (codes.astype(jnp.int32) - 128).astype(jnp.int8)
        dec = mm.decode(codes, lo, step)
        aux = jnp.sum(dec * dec, axis=1)
        self.mm_codes = jnp.zeros((cap, self.dim), jnp.int8).at[: self.n].set(
            codes_i8
        )
        self.mm_lo = jnp.zeros((cap,), jnp.float32).at[: self.n].set(lo)
        self.mm_step = jnp.ones((cap,), jnp.float32).at[: self.n].set(step)
        self.mm_aux = jnp.zeros((cap,), jnp.float32).at[: self.n].set(aux)

    def attach_spherical(self, *, n_bits: int = 4, seed: int = 0) -> None:
        """Train a spherical (RaBitQ-style) quantizer and bit-pack all
        current vectors.  Enables `search(mode="spherical")` — 1/2/4-bit
        traversal at the codes' true sub-byte footprint, with
        full-precision rerank (reference spherical inmem provider over
        BitSlice storage, `diskann-providers/.../inmem/spherical.rs`)."""
        from diskann_tpu.quant.spherical import train_spherical

        sq = train_spherical(jax.random.key(seed), self.dim, n_bits=n_bits)
        self.sph = sq
        vecs = self.state.vectors[: self.n]
        pc = sq.pack(sq.encode(vecs))
        wd = pc.words.shape[1]
        words = jnp.zeros((self.state.capacity, wd), pc.words.dtype)
        self.sph_words = words.at[: self.n].set(pc.words)
        self.sph_norms = jnp.zeros(
            (self.state.capacity,), jnp.float32
        ).at[: self.n].set(pc.norms)
        self.sph_cscale = jnp.zeros(
            (self.state.capacity,), jnp.float32
        ).at[: self.n].set(pc.cscale)

    _SPILL_ATTRS = (
        "pq_codes", "sq_codes", "sq_aux", "sph_words", "sph_norms",
        "sph_cscale", "mm_codes", "mm_lo", "mm_step", "mm_aux",
    )

    def _spill_device_state(self) -> dict:
        """Download every index-owned device array and release its HBM.

        TPU HBM buffers are CONTIGUOUS: after dropping a multi-GB table the
        arena is left fragmented by the smaller arrays interleaved around
        it, and an even larger allocation fails with ResourceExhausted even
        though total free bytes suffice.  Spilling everything empties the
        arena so the big table allocates first; `_restore_device_state`
        re-uploads the rest into the tail."""
        host: dict = {"state": jax.device_get(self.state)}
        self.state = graph_state.GraphArrays(
            vectors=jnp.zeros((1, 1), jnp.float32),
            sq_norms=jnp.zeros((1,), jnp.float32),
            adjacency=jnp.zeros((1, 1), jnp.int32),
            degrees=jnp.zeros((1,), jnp.int32),
            valid=jnp.zeros((1,), bool),
            vec_sum=jnp.zeros((1,), jnp.float32),
        )
        for name in self._SPILL_ATTRS:
            a = getattr(self, name, None)
            if a is not None:
                host[name] = np.asarray(a)
                setattr(self, name, None)
        if getattr(self, "labels", None) is not None:
            host["labels_bits"] = np.asarray(self.labels.bits)
            self.labels.bits = jnp.zeros((1, 1), jnp.uint32)
        for name in ("_auto_start", "_router_ids", "_cached_start"):
            a = getattr(self, name, None)
            if a is not None:
                host[name] = np.asarray(a)
                setattr(self, name, None)
        import gc

        gc.collect()
        return host

    def _restore_device_state(self, host: dict) -> None:
        self.state = jax.tree.map(jnp.asarray, host["state"])
        for name in self._SPILL_ATTRS:
            if name in host:
                setattr(self, name, jnp.asarray(host[name]))
        if "labels_bits" in host:
            self.labels.bits = jnp.asarray(host["labels_bits"])
        for name in ("_auto_start", "_router_ids", "_cached_start"):
            if name in host:
                setattr(self, name, jnp.asarray(host[name]))

    def attach_packed(self, *, dp: int | None = 64, sigma: float = 4.0,
                      writable: bool = True, refresh_block: int = 1 << 15,
                      spill: bool | None = None,
                      ) -> None:
        """Build the packed neighbor-code search layout: PCA-project vectors
        to ``dp`` dims, quantize to int8, and materialize each node's
        neighbors' codes contiguously per node.  The TPU analogue of the
        disk index's sector layout (one read serves one expansion,
        `disk_index_writer.rs`); call after build / after heavy updates —
        or pass ``build_mode="packed"`` to `build` to maintain it
        incrementally from the start.

        ``dp=dim`` (e.g. 128) keeps FULL-dimension int8 codes: traversal
        ordering becomes near-exact so a small rerank budget suffices — at
        1M scale such a table exceeds the writable 2^31-word scatter limit,
        so attach it ``writable=False`` (search-only; streaming updates
        need a re-attach).  Training/encoding run on device; only a 64k
        sample crosses to host for the PCA eigendecomposition."""
        from diskann_tpu.graph import packed as packed_mod

        sample = np.asarray(
            self.state.vectors[: min(1 << 16, self.n)], np.float32
        )
        proj, pscale, pbias2 = packed_mod.train_packed(
            sample, min(dp or self.dim, self.dim),
            self.config.metric, sigma=sigma,
        )
        # free any previous layout BEFORE allocating the new multi-GB table
        self.packed = None
        self._compose_cache = None
        cap = self.state.capacity
        rp = packed_mod.padded_degree(
            self.config.max_degree_with_slack, int(proj.shape[1])
        )
        new_bytes = (cap + 1) * packed_mod.n_wrows(
            rp, int(proj.shape[1])
        ) * 512
        if spill is None:
            spill = new_bytes > (4 << 30)   # big tables need an empty arena
        host_state = self._spill_device_state() if spill else None
        p = packed_mod.alloc_packed(
            proj, pscale, pbias2, cap,
            self.config.max_degree_with_slack, writable=writable,
        )
        if host_state is not None:
            # touch the table so the alloc really lands before re-uploading
            np.asarray(p.rows[:1, :1])
            self._restore_device_state(host_state)
            del host_state
        codes, aux = packed_mod.encode(
            p, self.state.vectors[: self.n], self.config.metric
        )
        p = packed_mod.set_self_codes_donated(
            p, jnp.arange(self.n, dtype=jnp.int32), codes, aux
        )
        np.asarray(p.self_aux[:1])
        del codes, aux            # free the encode temps before the refresh
        # full nbr-table rebuild in row blocks (bounds gather memory).
        # Sync EVERY block: dispatch is async and allocates transients at
        # enqueue, so an unsynced loop of donated multi-GB updates holds
        # every block's gather scratch at once and OOMs HBM (CLAUDE.md);
        # next to a near-HBM-sized table even TWO blocks in flight is too
        # many, so this loop trades pipelining for bounded scratch.
        bs = refresh_block if not spill else min(refresh_block, 1 << 14)
        for off in range(0, self.state.capacity, bs):
            rows = jnp.arange(off, min(off + bs, self.state.capacity),
                              dtype=jnp.int32)
            if rows.shape[0] < bs:
                rows = jnp.pad(rows, (0, bs - rows.shape[0]), constant_values=-1)
            p = packed_mod.refresh_rows_donated(p, self.state.adjacency, rows)
            np.asarray(p.rows[:1, :1])    # the only real barrier on axon
        self.packed = p

    def _scorer_for_mode(self, mode: str):
        """(ScorerDef, scorer_data, expand_r) for a search mode — the
        pluggable accessor boundary (`glue.rs:567` search_accessor)."""
        from diskann_tpu.graph.scorers import (
            full_precision_scorer, packed_scorer, pq_scorer, sq_scorer,
        )

        if mode == "full":
            sdef, sdata = full_precision_scorer(
                self.state.vectors, self.state.sq_norms, self.config.metric
            )
            return sdef, sdata, None
        if mode == "pq":
            sdef, sdata = pq_scorer(
                self.pq_codes, self.pq.pivots, self.config.metric
            )
            return sdef, sdata, None
        if mode == "packed":
            sdef, sdata = packed_scorer(self.packed, self.config.metric)
            return sdef, sdata, self.packed.r_pack
        if mode == "spherical":
            from diskann_tpu.graph.scorers import spherical_scorer

            sdef, sdata = spherical_scorer(
                self.sph_words, self.sph_norms, self.sph_cscale,
                self.sph.rotation, self.dim, int(self.sph.n_bits),
                self.config.metric,
            )
            return sdef, sdata, None
        if mode == "minmax":
            from diskann_tpu.graph.scorers import minmax_scorer

            sdef, sdata = minmax_scorer(
                self.mm_codes, self.mm_lo, self.mm_step, self.mm_aux,
                self.config.metric,
            )
            return sdef, sdata, None
        if mode == "sq":
            sdef, sdata = sq_scorer(
                self.sq_codes, self.sq.scale, self.sq_bias2, self.sq_aux,
                self.config.metric,
            )
            return sdef, sdata, None
        raise ValueError(f"unknown search mode {mode!r}")

    _compose_cache: dict | None = None

    def _router_ids_live(self, mode: str) -> jax.Array | None:
        """Host half of router start-points: the sampled live-id set (device
        top-k happens inside the composed search program)."""
        cfg = self.config
        size = min(cfg.router_size, self.n_live // 4)
        if cfg.router_size <= 0 or size < 64:
            return None
        if self._cached_start is not None and mode not in ("packed",):
            return None
        if self._router_ids is None:
            valid = np.asarray(self.state.valid[: self.n])
            live = np.nonzero(valid)[0]
            rng = np.random.default_rng(0xD15C)
            sel = rng.choice(live, size=min(size, len(live)), replace=False)
            self._router_ids = jnp.asarray(np.sort(sel).astype(np.int32))
        return self._router_ids

    _router_rows_cache: tuple | None = None

    def _router_rows(self, packed: bool) -> tuple:
        """Pre-gathered router rows, cached per (source arrays, id set).

        The [S, dp] (or [S, d]) row gather is issue-bound like every row
        gather on this target (~70ns/row, CLAUDE.md perf model) — done
        inside the composed program it costs ~0.8ms per sub-batch dispatch
        at S=64k.  Gathering once here and passing the rows as jit args
        removes it from every dispatch.  Identity keys are sound: both
        PackedState and GraphArrays are functional (mutations `_replace`
        into new objects), and `_invalidate_start` clears `_router_ids`."""
        rid = self._router_ids
        src = self.packed if packed else self.state
        c = self._router_rows_cache
        if c is not None and c[0] is src and c[1] is rid and c[2] == packed:
            return c[3]
        if packed:
            pk = self.packed
            rows = (pk.self_codes[rid], pk.self_aux[rid],
                    pk.proj, pk.pscale, pk.pbias2)
        else:
            st = self.state
            rows = (st.vectors[rid], st.sq_norms[rid])
        self._router_rows_cache = (src, rid, packed, rows)
        return rows

    #: Router distance math inside the composed program: "int8" (exact
    #: historical path) or "bf16" (halved [B, S] HBM materialization; entry
    #: points only need to be near-nearest).  Compose-cache keyed.
    router_compute: str = "int8"
    #: Statically unroll the composed hop loop (kills the ~0.5ms/iteration
    #: lax-loop scheduling floor; trades compile time).  Compose-cache keyed.
    unroll_hops: bool = False
    #: Pre-top_k hop candidates to the list width before the merge sort
    #: (shrinks the merge sort from l+W*R to 2l columns; exact up to
    #: equal-distance tie order).  Compose-cache keyed.  Default OFF: the
    #: round-5 interleaved battery measured it 4.5% SLOWER at the 1M
    #: operating point (the top_k over W*R=256 columns costs more than the
    #: wider merge saves; /tmp/r5_battery.json) — kept as a knob because
    #: the tradeoff flips at large L.
    merge_trunc: bool = False
    #: Ship the packed per-batch output as exact [*, 128] lane tiles
    #: (see `_pack_outputs(flat=...)`).  Compose-cache keyed.  Default OFF:
    #: in the production pipeline the padded D2H transfer hides behind the
    #: next sub-batch's compute (copy_to_host_async), while the repack adds
    #: in-program work on the critical path — the interleaved battery
    #: measured flat packing 7% SLOWER end-to-end (/tmp/r5_battery3.log)
    #: even though an isolated dispatch saves 6ms of padded transfer.
    pack_flat: bool = False

    def _composed_quant_fn(self, mode, k, l, w, rl, mh, wire,
                           use_router, router_starts=None):
        """ONE jitted program per search config: device upcast + router
        top-k + quantized traversal + full-precision rerank + output
        packing.  The relay link charges per dispatch (HTTP round trips on
        a one-core host), so five chained dispatches per sub-batch cost
        more than the compute at bench shape; composing them leaves one.
        Cached per config (the bench L-sweep hits several)."""
        expand_r = self.packed.r_pack if mode == "packed" else None
        sdef0, _, _ = self._scorer_for_mode(mode)
        # sdef0.name carries the scorer identity incl. packed (rp, dp) — a
        # re-attach at a different dp must not reuse a cached program whose
        # closure baked the old layout's shapes
        key = (mode, k, l, w, rl, mh, wire, use_router,
               router_starts, self.config, expand_r, sdef0.name,
               self.router_compute, self.unroll_hops, self.merge_trunc,
               self.pack_flat)
        if self._compose_cache is None:
            self._compose_cache = {}
        fn = self._compose_cache.get(key)
        if fn is not None:
            return fn
        from diskann_tpu.graph.search import beam_search_scored

        sdef, _, _ = self._scorer_for_mode(mode)
        cfg = self.config
        metric = cfg.metric
        dedup = "list" if (mode == "packed" or w > 1) else "ring"
        hist = cfg.history_capacity(l)
        # None/0 -> config default; clamp to the router table size (shapes
        # are static under jit, so an oversized top_k would fail at trace)
        n_start = router_starts if router_starts else cfg.router_starts
        if n_start < 1:
            raise ValueError(f"router_starts must be >= 1, got {n_start}")
        if use_router and self._router_ids is not None:
            n_start = min(n_start, int(self._router_ids.shape[0]))
        mh_eff = mh or cfg.max_hops
        rl_eff = min(rl, l) if rl else l
        packed_router = mode == "packed" or getattr(
            self, "_hbm_vectors_dropped", False
        )
        router_compute = self.router_compute
        unroll = self.unroll_hops
        mtrunc = self.merge_trunc
        pflat = self.pack_flat

        dim = self.dim

        @jax.jit
        def run(q_wire, sdata, adjacency, vectors, sq_norms, valid,
                router_ids, router_codes, start):
            if wire == "i8pack":
                q = _decode_i8pack(q_wire, dim)
            else:
                q = q_wire.astype(jnp.float32)
            if use_router:
                if packed_router:
                    rc, raux, proj, pscale, pbias2 = router_codes
                    st = _router_topk_packed_pre(
                        rc, raux, proj, pscale, pbias2,
                        router_ids, q, metric, n_start,
                        compute=router_compute,
                    )
                else:
                    rv, rsq = router_codes
                    st = _router_topk_full_pre(
                        rv, rsq, router_ids, q, metric, n_start
                    )
            else:
                st = start
            res = beam_search_scored(
                sdef, sdata, adjacency, st, q,
                l_search=l, beam_width=w, max_hops=mh_eff,
                history_capacity=hist, dedup=dedup, expand_r=expand_r,
                unroll=unroll, merge_trunc=mtrunc,
            )
            fd, fi = _rerank(
                res.ids[:, :rl_eff], q, vectors, sq_norms, valid, metric, k
            )
            return _pack_outputs(fd, fi, res.cmps, res.hops, flat=pflat)

        self._compose_cache[key] = run
        return run

    def _quant_search_batch(self, q, k, l, w, mode, start=None,
                            rerank_l: int | None = None,
                            max_hops: int | None = None):
        from diskann_tpu.graph.search import beam_search_scored

        sdef, sdata, _er = self._scorer_for_mode(mode)
        res = beam_search_scored(
            sdef, sdata, self.state.adjacency,
            start if start is not None else self._start(), q,
            l_search=l, beam_width=w,
            max_hops=max_hops or self.config.max_hops,
            history_capacity=self.config.history_capacity(l),
            # "list" beats "merge" at bench shape (8.1 vs 9.2 ms/iter,
            # scripts/profile_prod.py); both are exact in results
            dedup="list" if (mode == "packed" or w > 1) else "ring",
            expand_r=self.packed.r_pack if mode == "packed" else None,
        )
        # full-precision rerank of the top-L (RerankAndFilter,
        # disk_provider.rs:292): one gather + one sort, then filter deleted.
        # rerank_l budgets the gather (io_limit analogue).
        rl = min(rerank_l, l) if rerank_l else l
        fd, fi = _rerank(
            res.ids[:, :rl], q, self.state.vectors, self.state.sq_norms,
            self.state.valid, self.config.metric, k,
        )
        return _pack_outputs(fd, fi, res.cmps, res.hops)

    # ---------------------------------------------------------------- filters
    def attach_labels(self, labels_per_point: list[list[str]]) -> None:
        """Assign labels to points 0..len-1 (JSONL-ingestion shape)."""
        from diskann_tpu.filters import LabelSet

        self.labels = LabelSet.from_lists(
            labels_per_point, capacity=self.state.capacity
        )

    _pred_count_cache: dict | None = None

    def _predicate_count(self, predicate, accept_fn) -> int:
        """|{live ids matching predicate}|, cached per (predicate, label
        version, live set): ONE host sync per predicate instead of one per
        call (the count gates the posting-list-scan escape hatch)."""
        key = (repr(predicate), getattr(self.labels, "version", 0),
               self.n, self.n_deleted)
        if self._pred_count_cache is None:
            self._pred_count_cache = {}
        cnt = self._pred_count_cache.get(key)
        if cnt is None:
            cap = self.state.capacity
            acc_all = accept_fn(
                self.labels.bits,
                jnp.arange(cap, dtype=jnp.int32),
                self.state.valid,
            ) & self.state.valid
            cnt = int(jnp.sum(acc_all))
            self._pred_count_cache = {key: cnt}   # keep it tiny
        return cnt

    def _composed_filtered_fn(self, accept_fn, k, l, w, mh, beta, rl, wire,
                              use_router, n_start):
        """ONE jitted program for the production filtered search: device
        upcast + router top-k + packed int8 traversal with the inline beta
        filter + full-precision rerank of the MATCHED list + output packing
        (the packed analogue of `inline_filter_search.rs:38-75`, composed
        exactly like `_composed_quant_fn`)."""
        from diskann_tpu.graph.search import beam_search_scored

        sdef, _, _ = self._scorer_for_mode("packed")
        key = ("filtered", accept_fn, k, l, w, mh, beta, rl, wire,
               use_router, n_start, self.config, sdef.name,
               self.router_compute, self.unroll_hops, self.merge_trunc)
        if self._compose_cache is None:
            self._compose_cache = {}
        fn = self._compose_cache.get(key)
        if fn is not None:
            return fn
        cfg = self.config
        metric = cfg.metric
        hist = cfg.history_capacity(l)
        expand_r = self.packed.r_pack
        router_compute = self.router_compute
        unroll = self.unroll_hops
        mtrunc = self.merge_trunc

        @jax.jit
        def run(q_wire, sdata, adjacency, bits, vectors, sq_norms, valid,
                router_ids, router_codes, start):
            q = q_wire.astype(jnp.float32)
            if use_router:
                rc, raux, proj, pscale, pbias2 = router_codes
                st = _router_topk_packed_pre(
                    rc, raux, proj, pscale, pbias2,
                    router_ids, q, metric, n_start,
                    compute=router_compute,
                )
            else:
                st = start
            res = beam_search_scored(
                sdef, sdata, adjacency, st, q,
                l_search=l, beam_width=w, max_hops=mh,
                history_capacity=hist, dedup="list", expand_r=expand_r,
                accept_fn=accept_fn, accept_data=bits, filter_beta=beta,
                unroll=unroll, merge_trunc=mtrunc,
            )
            fd, fi = _rerank(
                res.match_i[:, :rl], q, vectors, sq_norms, valid, metric, k
            )
            return _pack_outputs(fd, fi, res.cmps, res.hops)

        self._compose_cache[key] = run
        return run

    def _search_filtered_packed(self, queries, accept_fn, k, l, w, mh, beta,
                                rl, query_dtype, adaptive_l, max_l_scale,
                                selectivity: float | None = None):
        """Production filtered path: sub-batched single-dispatch pipeline
        (upload i+1 overlaps compute i), identical shape to the quant
        search.  AdaptiveL falls back to ONE restart at a wider window when
        a query's matched list came back short (the reference re-searches
        too, `inline_filter_search.rs:63-75`).

        selectivity (matched fraction of live points, from the cached
        posting-list count) widens the FIRST pass: a 1-6%-selective
        predicate fills the matched list with plausible-but-wrong results,
        so the found<k retry never fires — the reference's AdaptiveL
        rescales L from an a-priori specificity estimate the same way
        (`inline_filter_search.rs:38-75`).  Only selective predicates pay
        the wider walk."""
        if selectivity is not None and selectivity > 0:
            if selectivity < 0.012:
                scale = min(4, max_l_scale)
            elif selectivity < 0.06:
                scale = min(2, max_l_scale)
            else:
                scale = 1
            if scale > 1:
                l = min(l * scale, 1024)
                rl = min(rl * scale, l)
                mh = min(mh * scale, 48)
        b = queries.shape[0]
        bs = min(self.search_batch_size, _round_up(b, 64))
        router_ids = self._router_ids_live("packed")
        use_router = router_ids is not None
        n_start = self.config.router_starts
        if use_router:
            n_start = min(n_start, int(router_ids.shape[0]))
            router_codes = self._router_rows(True)
        else:
            router_ids = jnp.zeros((1,), jnp.int32)
            router_codes = ()
        start = self._start()
        wire = np.dtype(query_dtype).name if query_dtype else None
        _, sdata, _ = self._scorer_for_mode("packed")

        def run_pass(l_cur, rl_cur, qset):
            nb = qset.shape[0]
            pbs = min(bs, _round_up(nb, 64))
            fn = self._composed_filtered_fn(
                accept_fn, k, l_cur, w, mh, beta, rl_cur, wire,
                use_router, n_start,
            )
            pending = []
            for off in range(0, nb, pbs):
                qb = qset[off : off + pbs]
                m = qb.shape[0]
                if m < pbs:
                    qb = np.pad(qb, ((0, pbs - m), (0, 0)))
                q_wire = jnp.asarray(
                    qb.astype(query_dtype) if query_dtype is not None else qb
                )
                out = fn(
                    q_wire, sdata, self.state.adjacency, self.labels.bits,
                    self.state.vectors, self.state.sq_norms,
                    self.state.valid, router_ids, router_codes, start,
                )
                try:
                    out.copy_to_host_async()
                except Exception:
                    pass
                pending.append((off, m, out))
            out_d = np.full((nb, k), np.inf, np.float32)
            out_i = np.full((nb, k), -1, np.int32)
            cmps = np.zeros((nb,), np.int32)
            hops = np.zeros((nb,), np.int32)
            for off, m, out in pending:
                fd, fi, cm, hp = _unpack_outputs(np.asarray(out), k)
                out_d[off : off + m] = fd[:m]
                out_i[off : off + m] = fi[:m]
                cmps[off : off + m] = cm[:m]
                hops[off : off + m] = hp[:m]
            return out_d, out_i, cmps, hops

        out_d, out_i, cmps, hops = run_pass(l, min(rl, l), queries)
        found = (out_i >= 0).sum(axis=1)
        if adaptive_l and (found < k).any() and max_l_scale > 1:
            # Compact retry (VERDICT r4 item 6): the wider second pass walks
            # ONLY the short queries (gathered into a 64-padded sub-batch)
            # instead of re-dispatching all B at max_l_scale x the cost —
            # the reference's AdaptiveL likewise re-searches only the
            # unsatisfied query (`inline_filter_search.rs:63-75`).
            short = found < k
            l1 = min(l * max_l_scale, 1024)
            d2, i2, c2, h2 = run_pass(l1, min(max(rl, k), l1), queries[short])
            out_d[short], out_i[short] = d2, i2
            cmps[short] = cmps[short] + c2
            hops[short] = hops[short] + h2
        stats = SearchStats(
            cmps=cmps, hops=hops, result_count=(out_i >= 0).sum(axis=1)
        )
        return out_d, out_i, stats

    def search_filtered(
        self,
        queries,
        predicate,
        k: int = 10,
        *,
        l_search: int | None = None,
        beam_width: int | None = None,
        filter_beta: float | None = None,
        adaptive_l: bool = True,
        max_l_scale: int = 8,
        method: str = "inline",
        scan_threshold: int | None = None,
        mode: str = "full",
        rerank_l: int | None = None,
        max_hops: int | None = None,
        query_dtype=None,
    ):
        """Label-filtered k-NN.

        method="inline": inline beta-filter search
        (`inline_filter_search.rs:38-75`) — one navigation pass over all
        nodes with matching distances biased by beta, plus a matched-only
        result list; optional adaptive-L re-search when the filter is too
        selective.
        method="multihop": accept-only navigation with two-hop expansion
        through rejected nodes (`multihop_filter_search.rs`).
        scan_threshold: max match-set size for the exact posting-list scan
        (default max(4*l_search, 512) for inline, always for prefilter);
        0 forces graph navigation.
        mode="packed": the PRODUCTION path — packed int8 traversal with the
        inline filter, router entry points, full-precision rerank of the
        matched list, all composed into one dispatch per sub-batch (the
        filtered analogue of `search(mode="packed")`)."""
        from diskann_tpu.filters import compile_accept, parse_predicate
        from diskann_tpu.graph.scorers import full_precision_scorer
        from diskann_tpu.graph.search import (
            beam_search_scored, grow_resume_state, search_geometry,
        )

        if isinstance(predicate, str):
            predicate = parse_predicate(predicate)
        accept_fn = compile_accept(
            predicate, self.labels.vocab, self.state.capacity
        )
        beta = filter_beta if filter_beta is not None else 0.5
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        l0 = l_search if l_search is not None else max(k, self.config.l_build)
        w = beam_width if beam_width is not None else self.config.beam_width

        # ---- selective-predicate escape hatch: exact posting-list scan ----
        # Graph navigation only SEES matches it happens to walk past; at
        # ~1% selectivity that loses most of the k.  The reference's
        # label-filter crate keeps Roaring posting lists and evaluates
        # selective predicates directly (`diskann-label-filter/src/kv_index/
        # query_evaluator_impl.rs`); here the posting list is the compiled
        # accept mask over all ids, and a small match set is scanned exactly.
        cnt = None
        if method in ("inline", "prefilter") and not getattr(
            self, "_hbm_vectors_dropped", False
        ):
            cnt = self._predicate_count(predicate, accept_fn)
            cap = self.state.capacity
            if scan_threshold is not None:
                threshold = scan_threshold
            else:
                # mid-selectivity predicates (<= ~6% of capacity, capped at
                # 64k members) scan exactly too: one gather + one MXU
                # matmul per query chunk is both faster and exact vs a
                # beta-biased walk that must pass through non-matching
                # regions (the reference evaluates selective predicates
                # straight off Roaring posting lists,
                # `diskann-label-filter/src/kv_index/query_evaluator_impl.rs`)
                threshold = (
                    max(4 * l0, 512, min(cap // 16, 1 << 16))
                    if method == "inline" else cap
                )
            if cnt <= threshold:
                acc_all = accept_fn(
                    self.labels.bits,
                    jnp.arange(cap, dtype=jnp.int32),
                    self.state.valid,
                ) & self.state.valid
                members = np.nonzero(np.asarray(acc_all))[0]
                pad = max(1 << int(np.ceil(np.log2(max(len(members), 1)))),
                          64)
                mem = np.full((pad,), -1, np.int32)
                mem[: len(members)] = members
                b = queries.shape[0]
                # chunk queries so the [B, M] distance matrix stays <=
                # ~512MB next to a near-full HBM (whole-table-intermediate
                # rule, CLAUDE.md)
                qc = max(min(b, (1 << 27) // max(pad, 1)), 64)
                mem_d = jnp.asarray(mem)
                fd = np.empty((b, k), np.float32)
                fi = np.empty((b, k), np.int32)
                for off in range(0, b, qc):
                    cd, ci = _member_scan(
                        jnp.asarray(queries[off : off + qc]), mem_d,
                        self.state.vectors, self.state.sq_norms,
                        self.config.metric, k,
                    )
                    fd[off : off + qc] = np.asarray(cd)
                    fi[off : off + qc] = np.asarray(ci)
                stats = SearchStats(
                    cmps=np.full((b,), cnt, np.int32),
                    hops=np.zeros((b,), np.int32),
                    result_count=(fi >= 0).sum(axis=1),
                )
                return fd, fi, stats

        if mode == "packed":
            if self.packed is None:
                raise ValueError("attach_packed first for mode='packed'")
            live = max(self.n - self.n_deleted, 1)
            return self._search_filtered_packed(
                queries, accept_fn, k, l0, w,
                max_hops or self.config.max_hops, beta,
                rerank_l or l0, query_dtype, adaptive_l, max_l_scale,
                selectivity=(cnt / live) if cnt is not None else None,
            )

        sdef, sdata = full_precision_scorer(
            self.state.vectors, self.state.sq_norms, self.config.metric
        )
        start = self._start()

        def run(l, resume=None):
            return beam_search_scored(
                sdef, sdata, self.state.adjacency, start,
                jnp.asarray(queries),
                l_search=l, beam_width=w, max_hops=self.config.max_hops,
                history_capacity=self.config.history_capacity(l),
                accept_fn=accept_fn, accept_data=self.labels.bits,
                filter_beta=beta, filter_mode=method,
                resume_state=resume, return_state=True,
                reseed_ring=resume is not None,
            )

        res, scratch = run(l0)
        found = np.asarray((res.match_i >= 0).sum(axis=1))
        if adaptive_l and (found < k).any():
            # AdaptiveL (`inline_filter_search.rs:63-75`): estimate
            # specificity from the first pass, rescale L log-style — but
            # RESUME the pass-1 scratch at the larger window (grown via
            # `grow_resume_state`) instead of re-searching from the start
            # points: expanded nodes stay expanded, the matched list
            # carries over, and only the incremental frontier is walked
            # (the reference's re-search pays the full cost again).
            # specificity = encounter rate (matches found per node SCORED),
            # not list fill: a small list fills from few matches while most
            # of the walk sees non-matching nodes, which is exactly when a
            # wider window pays off
            cmps_sum = float(np.asarray(res.cmps).sum())
            spec = max(float(found.sum()) / max(cmps_sum, 1.0), 1e-4)
            if spec >= 0.5:
                scale = 1
            elif spec >= 0.1:
                scale = 2
            else:
                scale = min(int(2 ** int(np.ceil(-np.log10(spec)))), max_l_scale)
            # never shrink below l0: at l0 > 1024 the cap would otherwise
            # hand grow_resume_state a smaller window (hard assert)
            l1 = max(min(l0 * scale, 1024), l0)
            if scale > 1 and l1 > l0:
                l_tot, _, h_new = search_geometry(
                    l_search=l1, reserve=0, beam_width=w,
                    r=self.state.adjacency.shape[1], s=start.shape[-1],
                    history_capacity=self.config.history_capacity(l1),
                )
                res, scratch = run(
                    l1, resume=grow_resume_state(scratch, l_tot, h_new)
                )

        fd, fi = _filter_deleted(res.match_d, res.match_i, self.state.valid, k)
        stats = SearchStats(
            cmps=np.asarray(res.cmps),
            hops=np.asarray(res.hops),
            result_count=np.asarray((np.asarray(fi) >= 0).sum(axis=1)),
        )
        return np.asarray(fd), np.asarray(fi), stats

    # ----------------------------------------------------------------- delete
    def delete(self, ids, *, method: str = "scan", k_value: int = 16,
               l_value: int | None = None, repair: str = "prune",
               max_dead: int = 4, repl_cap: int = 16) -> None:
        """In-place delete (IP-DiskANN): patch in-neighbors, drop rows.
        Deleted slots go to the freelist for reuse by later inserts.

        method selects the replacement policy (`InplaceDeleteMethod`,
        `diskann/src/graph/misc.rs:27-32`): "one_hop", "two_hop_one_hop",
        "visited_topk" (k_value/l_value), or "scan" (default: full-graph
        repair — one vectorized gather on TPU, a superset of all three
        reference approximations, so no dangling references survive).

        repair selects the patch kernel: "prune" RobustPrunes every patched
        row back to R; "fill" follows the reference's patch-then-maybe-prune
        (index.rs:1558): dead entries drop out, nearest replacements top the
        row up to the slack capacity, no occlusion scan — ~5x cheaper, the
        streaming production setting."""
        from diskann_tpu.graph.delete import inplace_delete

        inplace_delete(
            self, np.asarray(ids), method=method, k_value=k_value,
            l_value=l_value, repair=repair, max_dead=max_dead,
            repl_cap=repl_cap,
        )
        self._invalidate_start()

    def consolidate(self) -> None:
        """Fresh-DiskANN-style cleanup sweep: repair any rows still
        referencing deleted nodes (`drop_deleted_neighbors`, index.rs:1756)."""
        from diskann_tpu.graph import delete as del_mod

        affected = np.nonzero(
            np.asarray(del_mod.rows_referencing_deleted(self.state))
        )[0]
        bs = 1024
        for off in range(0, len(affected), bs):
            chunk = affected[off : off + bs].astype(np.int32)
            pad = (-len(chunk)) % bs
            if pad:
                chunk = np.pad(chunk, (0, pad), constant_values=-1)
            self.state = del_mod.patch_rows(
                self.state, jnp.asarray(chunk), self.config
            )
        self.state = del_mod.drop_deleted_rows(self.state)

    # -------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        """Persist the index AND every attachment (packed layout, PQ/SQ/
        spherical codes, labels, pinned start) so a reload reproduces
        identical search results in every mode.

        Versioned manifest + binary artifacts (`diskann-record` semantics;
        provider-level analogue of `diskann-providers/src/storage/
        {index_storage,pq_storage,sq_storage}.rs`)."""
        from diskann_tpu.io_.record import save_record

        cfg = self.config
        n = self.n
        meta = {
            "n": n,
            "dim": self.dim,
            "dtype": self.state.vectors.dtype.name,
            "n_deleted": self.n_deleted,
            "free_slots": list(map(int, self.free_slots)),
            "hbm_vectors_dropped": bool(
                getattr(self, "_hbm_vectors_dropped", False)
            ),
            "config": {
                "max_degree": cfg.max_degree,
                "l_build": cfg.l_build,
                "alpha": cfg.alpha,
                "graph_slack_factor": cfg.graph_slack_factor,
                "max_occlusion_size": cfg.max_occlusion_size,
                "saturate_after_prune": cfg.saturate_after_prune,
                "metric": cfg.metric.value,
                "beam_width": cfg.beam_width,
            },
        }
        def fetch_rows(dev_arr, rows: int, step: int = 1 << 21):
            """Chunked device->host fetch: a one-shot [:n] slice of a
            multi-GB array materializes a full second copy in HBM next to
            the original (and >=2GB single transfers have crashed the
            remote helper — CLAUDE.md); <=512MB slices are verified safe."""
            if rows * max(dev_arr[:1].nbytes, 1) <= (1 << 29):
                return np.asarray(dev_arr[:rows])
            out = np.empty((rows,) + dev_arr.shape[1:], dev_arr.dtype)
            for off in range(0, rows, step):
                end = min(off + step, rows)
                out[off:end] = np.asarray(dev_arr[off:end])
            return out

        arrays = {
            "adjacency": fetch_rows(self.state.adjacency, n),
            "degrees": np.asarray(self.state.degrees[:n]),
            "valid": np.asarray(self.state.valid[:n]),
        }
        if not meta["hbm_vectors_dropped"]:
            arrays["vectors"] = fetch_rows(self.state.vectors, n)
            # persisted (not recomputed on load): device-computed norms can
            # differ by an ulp from a host recompute, and "identical results
            # after reload" is the contract
            arrays["sq_norms"] = np.asarray(self.state.sq_norms[:n])
        if self._cached_start is not None:
            arrays["cached_start"] = np.asarray(self._cached_start)

        if self.packed is not None:
            p = self.packed
            meta["packed"] = {"r_pack": int(p.r_pack), "dp": int(p.dp)}
            arrays["packed_proj"] = np.asarray(p.proj)
            arrays["packed_pscale"] = np.asarray(p.pscale)
            arrays["packed_pbias2"] = np.asarray(p.pbias2)
            arrays["packed_self_codes"] = np.asarray(p.self_codes[:n])
            arrays["packed_self_aux"] = np.asarray(p.self_aux[:n])
            # fetch the multi-GB word table in <=512MB slices: one big
            # device slice would materialize a second copy next to the
            # table and OOM HBM at 1M scale
            total = n * p.nwr
            host_rows = np.empty((total, 128), np.int32)
            step = 1 << 20
            for off in range(0, total, step):
                end = min(off + step, total)
                host_rows[off:end] = np.asarray(p.rows[off:end])
            arrays["packed_rows"] = host_rows
        if getattr(self, "pq", None) is not None:
            arrays["pq_pivots"] = np.asarray(self.pq.pivots)
            arrays["pq_codes"] = fetch_rows(self.pq_codes, n)
        if getattr(self, "sq", None) is not None:
            meta["sq"] = {"n_bits": int(self.sq.n_bits)}
            arrays["sq_scale"] = np.asarray(self.sq.scale)
            arrays["sq_bias"] = np.asarray(self.sq.bias)
            arrays["sq_codes"] = fetch_rows(self.sq_codes, n)
            arrays["sq_bias2"] = np.asarray(self.sq_bias2)
            arrays["sq_aux"] = np.asarray(self.sq_aux[:n])
        if getattr(self, "sph", None) is not None:
            meta["spherical"] = {"n_bits": int(self.sph.n_bits)}
            arrays["sph_rotation"] = np.asarray(self.sph.rotation)
            arrays["sph_words"] = np.asarray(self.sph_words[:n])
            arrays["sph_norms"] = np.asarray(self.sph_norms[:n])
            arrays["sph_cscale"] = np.asarray(self.sph_cscale[:n])
        if getattr(self, "mm", None) is not None:
            meta["minmax"] = {"n_bits": int(self.mm.n_bits)}
            arrays["mm_codes"] = np.asarray(self.mm_codes[:n])
            arrays["mm_lo"] = np.asarray(self.mm_lo[:n])
            arrays["mm_step"] = np.asarray(self.mm_step[:n])
            arrays["mm_aux"] = np.asarray(self.mm_aux[:n])
        if getattr(self, "labels", None) is not None:
            meta["labels"] = {"vocab": self.labels.vocab}
            arrays["labels_bits"] = np.asarray(self.labels.bits[:n])

        save_record(path, kind="graph_index", meta=meta, arrays=arrays)

    @classmethod
    def load(cls, path: str, **kwargs) -> "GraphIndex":
        from diskann_tpu.io_.record import load_record

        manifest, arrays = load_record(path)
        meta = manifest["meta"]
        c = meta["config"]
        cfg = GraphConfig(
            max_degree=c["max_degree"],
            l_build=c["l_build"],
            alpha=c["alpha"],
            graph_slack_factor=c["graph_slack_factor"],
            max_occlusion_size=c["max_occlusion_size"],
            saturate_after_prune=c["saturate_after_prune"],
            metric=Metric(c["metric"]),
            beam_width=c.get("beam_width", 1),
        )
        kwargs.setdefault("dtype", jnp.dtype(meta.get("dtype", "float32")))
        idx = cls(meta["dim"], cfg, capacity=max(meta["n"], 1024), **kwargs)
        n = meta["n"]

        def upload_rows(buf, host, step: int = 1 << 21):
            """Chunked DONATED row upload into a preallocated device
            buffer: `.at[:n].set(...)` of a multi-GB host array holds the
            upload staging + old + new buffer at once and OOMs HBM at the
            20M tier; donated dynamic_update_slice streams it."""
            rows = host.shape[0]
            if rows * max(host[:1].nbytes, 1) <= (1 << 29):
                return buf.at[:rows].set(jnp.asarray(host))
            upd = jax.jit(
                lambda b, c, o: jax.lax.dynamic_update_slice(
                    b, c, (o,) + (jnp.int32(0),) * (b.ndim - 1)
                ),
                donate_argnums=(0,),
            )
            prev = None
            for off in range(0, rows, step):
                buf = upd(buf, jnp.asarray(host[off:off + step]),
                          jnp.int32(off))
                if prev is not None:
                    np.asarray(prev)   # one-behind sync (CLAUDE.md)
                prev = buf[:1]
            return buf
        idx.n = n
        idx.n_deleted = meta.get("n_deleted", 0)
        idx.free_slots = list(meta.get("free_slots", []))
        valid = jnp.asarray(arrays["valid"])
        st = idx.state
        dropped = meta.get("hbm_vectors_dropped", False)
        if dropped:
            idx._hbm_vectors_dropped = True
            st = st._replace(
                vectors=jnp.zeros((1, idx.dim), st.vectors.dtype),
                sq_norms=jnp.zeros((1,), jnp.float32),
            )
        else:
            vecs = jnp.asarray(arrays["vectors"])
            norms = (
                jnp.asarray(arrays["sq_norms"])
                if "sq_norms" in arrays
                else jnp.sum(vecs.astype(jnp.float32) ** 2, axis=-1)
            )
            st = st._replace(
                vectors=st.vectors.at[:n].set(vecs.astype(st.vectors.dtype)),
                sq_norms=st.sq_norms.at[:n].set(norms),
                vec_sum=jnp.sum(
                    jnp.where(valid[:, None], vecs.astype(jnp.float32), 0.0),
                    axis=0,
                ),
            )
        st = st._replace(
            adjacency=upload_rows(st.adjacency, arrays["adjacency"]),
            degrees=st.degrees.at[:n].set(jnp.asarray(arrays["degrees"])),
            valid=st.valid.at[:n].set(valid),
        )
        idx.state = st
        if "cached_start" in arrays:
            idx._cached_start = jnp.asarray(arrays["cached_start"])

        cap = idx.state.capacity
        if "packed" in meta:
            from diskann_tpu.graph import packed as packed_mod

            pm = meta["packed"]
            rp, dp = pm["r_pack"], pm["dp"]
            nwr = packed_mod.n_wrows(rp, dp)
            rows = packed_mod._empty_rows(cap + 1, rp, dp)
            # chunked donated updates: the table is multi-GB, a one-shot
            # functional update would hold two copies in HBM
            upd = jax.jit(
                lambda r, c, o: jax.lax.dynamic_update_slice(
                    r, c, (o, jnp.int32(0))
                ),
                donate_argnums=(0,),
            )
            host_rows = arrays["packed_rows"]
            step = 1 << 20
            for off in range(0, host_rows.shape[0], step):
                end = min(off + step, host_rows.shape[0])
                rows = upd(rows, jnp.asarray(host_rows[off:end]),
                           jnp.int32(off))
            idx.packed = packed_mod.PackedState(
                proj=jnp.asarray(arrays["packed_proj"]),
                pscale=jnp.asarray(arrays["packed_pscale"]),
                pbias2=jnp.asarray(arrays["packed_pbias2"]),
                self_codes=jnp.zeros((cap, dp), jnp.int8)
                .at[:n].set(jnp.asarray(arrays["packed_self_codes"])),
                self_aux=jnp.zeros((cap,), jnp.float32)
                .at[:n].set(jnp.asarray(arrays["packed_self_aux"])),
                rows=rows,
                r_pack=rp,
            )
        if "pq_pivots" in arrays:
            from diskann_tpu.quant.pq import PQ

            idx.pq = PQ(pivots=jnp.asarray(arrays["pq_pivots"]), dim=idx.dim)
            m = idx.pq.n_chunks
            idx.pq_codes = jnp.zeros((cap, m), jnp.uint8).at[:n].set(
                jnp.asarray(arrays["pq_codes"])
            )
        if "sq" in meta:
            from diskann_tpu.quant.scalar import ScalarQuantizer

            idx.sq = ScalarQuantizer(
                scale=jnp.asarray(arrays["sq_scale"]),
                bias=jnp.asarray(arrays["sq_bias"]),
                n_bits=meta["sq"]["n_bits"],
            )
            idx.sq_codes = upload_rows(
                jnp.zeros((cap, idx.dim), jnp.int8), arrays["sq_codes"]
            )
            idx.sq_bias2 = jnp.asarray(arrays["sq_bias2"])
            idx.sq_aux = jnp.zeros((cap,), jnp.float32).at[:n].set(
                jnp.asarray(arrays["sq_aux"])
            )
        if "spherical" in meta:
            from diskann_tpu.quant.spherical import SphericalQuantizer

            idx.sph = SphericalQuantizer(
                rotation=jnp.asarray(arrays["sph_rotation"]),
                n_bits=meta["spherical"]["n_bits"],
            )
            wd = arrays["sph_words"].shape[1]
            wdt = jnp.asarray(arrays["sph_words"]).dtype
            idx.sph_words = jnp.zeros((cap, wd), wdt).at[:n].set(
                jnp.asarray(arrays["sph_words"])
            )
            idx.sph_norms = jnp.zeros((cap,), jnp.float32).at[:n].set(
                jnp.asarray(arrays["sph_norms"])
            )
            idx.sph_cscale = jnp.zeros((cap,), jnp.float32).at[:n].set(
                jnp.asarray(arrays["sph_cscale"])
            )
        if "minmax" in meta:
            from diskann_tpu.quant.minmax import MinMaxQuantizer

            idx.mm = MinMaxQuantizer(n_bits=meta["minmax"]["n_bits"])
            idx.mm_codes = jnp.zeros((cap, idx.dim), jnp.int8).at[:n].set(
                jnp.asarray(arrays["mm_codes"])
            )
            idx.mm_lo = jnp.zeros((cap,), jnp.float32).at[:n].set(
                jnp.asarray(arrays["mm_lo"])
            )
            idx.mm_step = jnp.ones((cap,), jnp.float32).at[:n].set(
                jnp.asarray(arrays["mm_step"])
            )
            idx.mm_aux = jnp.zeros((cap,), jnp.float32).at[:n].set(
                jnp.asarray(arrays["mm_aux"])
            )
        if "labels" in meta:
            from diskann_tpu.filters import LabelSet

            vocab = meta["labels"]["vocab"]
            bits = np.asarray(arrays["labels_bits"])
            ls = LabelSet(cap, vocab, n_words=bits.shape[1])
            ls.bits = jnp.asarray(
                np.concatenate(
                    [bits, np.zeros((cap - n, bits.shape[1]), bits.dtype)]
                )
            )
            idx.labels = ls
        return idx

    # ------------------------------------------------------------------ misc
    @property
    def n_live(self) -> int:
        return self.n - self.n_deleted

    @property
    def metric(self) -> Metric:
        return self.config.metric

    def __len__(self) -> int:
        return self.n_live
