"""Tiered index: HBM-resident compact codes + host-RAM full vectors.

Search flow (mirrors `DiskIndexSearcher::search`, `disk_provider.rs:806`):
 1. traversal on the device over the packed int8 neighbor-code layout
    (PQ-distance analogue, `disk_provider.rs:634-654`);
 2. the top-L candidate ids come back to the host; their full-precision rows
    are gathered from host RAM (the "sector read", `ensure_loaded` :777);
 3. rerank happens on device against the staged rows
    (`RerankAndFilter`, :292).

An `io_limit` caps how many full rows may be staged per query — the direct
analogue of the disk tier's IO budget / beam-width early termination
(`disk_provider.rs:683-722`).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.trace import span
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.ops.distance import Metric, distance_to_set, squared_norms


class HostVectorStore:
    """Full-precision vectors in host RAM (optionally mmap'd from an .fbin
    — the NVMe-file analogue).  File-backed stores use the native C++ IO
    runtime (`diskann_tpu.native`: mmap + threaded batched gather + LRU row
    cache) when available."""

    def __init__(self, vectors: np.ndarray):
        self.vectors = vectors  # may be np.memmap
        self.n, self.dim = vectors.shape
        self._native = None
        self.source_path: str | None = None

    @classmethod
    def from_fbin(cls, path: str, *, cache_rows: int = 0,
                  uring: bool | None = None):
        """uring=True opts the file into io_uring batched reads (right for
        SSD cold reads; mmap wins page-cache-resident).  Default: env
        DISKANN_URING=1.  Silently degrades where the kernel refuses."""
        if uring is None:
            import os as _os

            uring = _os.environ.get("DISKANN_URING") == "1"
        try:
            from diskann_tpu.native import NativeVectorFile

            nf = NativeVectorFile(path, 4, cache_rows=cache_rows, uring=uring)
            self = cls.__new__(cls)
            self.vectors = None
            self.n, self.dim = nf.n, nf.dim
            self._native = nf
            self.source_path = path
            return self
        except Exception:
            from diskann_tpu.io_.fbin import read_fbin

            self = cls(read_fbin(path, mmap=True))
            self.source_path = path
            return self

    def fetch(self, ids: np.ndarray) -> np.ndarray:
        """Batched row gather (the io_uring read batch)."""
        ids = np.asarray(ids)
        if self._native is not None:
            return self._native.gather(ids.reshape(-1)).reshape(
                ids.shape + (self.dim,)
            )
        safe = np.clip(ids, 0, self.n - 1)
        return np.ascontiguousarray(self.vectors[safe], dtype=np.float32)

    def fetch_async(self, ids: np.ndarray):
        """Submit an async gather (native worker pool); pair with
        `fetch_wait`.  Falls back to a synchronous gather."""
        ids = np.asarray(ids)
        if self._native is not None:
            return ("native", ids.shape, self._native.gather_async(
                ids.reshape(-1)
            ))
        return ("sync", ids.shape, self.fetch(ids))

    def fetch_wait(self, handle) -> np.ndarray:
        kind, shape, payload = handle
        if kind == "native":
            return self._native.wait(payload).reshape(shape + (self.dim,))
        return payload


class TieredIndex:
    """DiskANN-style two-tier index for datasets larger than HBM."""

    def __init__(self, graph: GraphIndex, store: HostVectorStore, *,
                 io_limit: int | None = None):
        self.graph = graph
        self.store = store
        self.io_limit = io_limit
        self.io_stats = {"rows_staged": 0, "stage_s": 0.0}

    @property
    def config(self):
        return self.graph.config

    def search_range(self, queries, radius: float, *,
                     l_init: int | None = None, l_max: int = 1024):
        """All ids within `radius` (reference `Range::search` two-round
        doubling over the disk tier): each round's candidates rerank
        exactly from host rows, so radius membership is exact."""
        from diskann_tpu.graph.modes import range_search

        return range_search(self, queries, radius, l_init=l_init,
                            l_max=l_max)

    @classmethod
    def build_from_host(
        cls,
        vectors: np.ndarray,
        config: GraphConfig | None = None,
        *,
        dp: int = 64,
        insert_batch_size: int = 4096,
        **kw,
    ) -> "TieredIndex":
        """Build the graph (device-side), attach the packed code layout,
        then DROP the full vectors from HBM, keeping them host-side only."""
        graph = GraphIndex.build(
            vectors, config, insert_batch_size=insert_batch_size, **kw
        )
        graph.attach_packed(dp=dp)
        store = HostVectorStore(np.asarray(vectors))
        # pin the entry point, then release the HBM full-precision copy:
        # traversal only needs the packed codes from here on
        graph._cached_start = graph._start()
        graph.state = graph.state._replace(
            vectors=jnp.zeros((1, graph.dim), graph.state.vectors.dtype),
            sq_norms=jnp.zeros((1,), jnp.float32),
        )
        graph._hbm_vectors_dropped = True
        return cls(graph, store)

    def _traversal_scorer(self, mode: str | None):
        """(mode, sdef, sdata, expand_r, dedup) for the HBM traversal tier.
        mode=None picks packed when attached, then sq (full-dim int8 —
        near-exact ordering, the dp=128 lesson), then pq; the packed fat
        rows are fastest but cap at a few million points/chip; PQ codes are
        the 100M-class representation (`disk_provider.rs:634` PQ-in-RAM)."""
        g = self.graph
        if mode is None or mode == "full":
            # "full" is meaningless here — the full-precision tier lives
            # host-side; auto-pick the HBM traversal representation
            if g.packed is not None:
                mode = "packed"
            elif getattr(g, "sq", None) is not None:
                mode = "sq"
            else:
                mode = "pq"
        sdef, sdata, expand_r = g._scorer_for_mode(mode)
        dedup = "merge" if mode == "packed" else "list"
        return mode, sdef, sdata, expand_r, dedup

    # ------------------------------------------------------- router starts
    _router_ids = None
    _router_table_cache: tuple | None = None

    def attach_router(self, size: int = 65536, seed: int = 0xD15C) -> None:
        """Sample per-query entry points for the tiered traversal — the
        reference's start-point strategies (`start_point.rs:19-41`) done
        the TPU way: ONE matmul of the query batch against `size` sampled
        live rows picks each query's nearest entries, replacing the single
        approximated medoid (which costs many early hops at >HBM scale —
        the r3 20M walk started every query from one node)."""
        import numpy as np

        g = self.graph
        valid = np.asarray(g.state.valid[: g.n])
        live = np.nonzero(valid)[0]
        rng = np.random.default_rng(seed)
        sel = np.sort(
            rng.choice(live, size=min(size, len(live)), replace=False)
        )
        self._router_ids = jnp.asarray(sel.astype(np.int32))
        self._router_table_cache = None

    def _router_table(self, mode: str):
        """(kind, rows...) — the pre-gathered router rows for `mode`
        (gathered once, passed as jit args: row gathers are issue-bound,
        ~70ns/row, so doing this per dispatch would cost ~5ms at S=64k)."""
        g = self.graph
        c = self._router_table_cache
        if c is not None and c[0] is self._router_ids and c[1] == mode:
            return c[2]
        rid = self._router_ids
        if mode == "sq":
            tab = ("i8", g.sq_codes[rid], g.sq_aux[rid])
        elif mode == "packed":
            pk = g.packed
            tab = ("i8", pk.self_codes[rid], pk.self_aux[rid])
        else:  # pq: reconstruct the sampled rows once (S x d f32 is small)
            rv = g.pq.decode(g.pq_codes[rid])[:, : g.dim]
            tab = ("f32", rv, jnp.sum(rv * rv, axis=1))
        self._router_table_cache = (rid, mode, tab)
        return tab

    _compose_cache: dict | None = None

    def _composed_traverse_fn(self, mode: str, l: int, w: int, mh: int,
                              budget: int, n_start: int, wire: str | None):
        """ONE jitted program per search config: device upcast + router
        top-k + quantized traversal + id-pack.  The tiered rerank cannot
        join it (full rows live host-side), so the flow is two dispatches
        per batch — traversal+pack here, exact rerank after staging — vs
        the r3 pipeline's four (the production quant-path recipe,
        `graph/index.py:968-1042`)."""
        from diskann_tpu.graph.search import beam_search_scored

        g = self.graph
        _, sdef, _, expand_r, dedup = self._traversal_scorer(mode)
        key = (mode, l, w, mh, budget, n_start, wire, g.config, sdef.name)
        if self._compose_cache is None:
            self._compose_cache = {}
        fn = self._compose_cache.get(key)
        if fn is not None:
            return fn
        cfg = g.config
        metric = cfg.metric
        hist = cfg.history_capacity(l)

        @jax.jit
        def run(q_wire, sdata, adjacency, router_ids, router_rows, start):
            q = q_wire.astype(jnp.float32)
            if n_start > 0:
                q_ctx = sdef.prep(sdata, q)
                if mode in ("sq", "packed"):
                    # int8 router: same quantized-query math as the
                    # traversal scorer, one MXU matmul over the table
                    rc, raux = router_rows
                    qi, qscale, qsq = q_ctx
                    dots = jax.lax.dot_general(
                        qi, rc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * qscale[:, None]
                    if metric == Metric.InnerProduct:
                        d = -dots
                    else:
                        d = qsq[:, None] + raux[None, :] - 2.0 * dots
                else:
                    rv, rsq = router_rows
                    d = distance_to_set(
                        q, rv, metric,
                        x_sq_norms=rsq,
                        q_sq_norms=squared_norms(q)
                        if metric.needs_norms else None,
                    )
                _, top = jax.lax.top_k(-d, n_start)
                st = router_ids[top]
            else:
                st = start
            res = beam_search_scored(
                sdef, sdata, adjacency, st, q,
                l_search=l, beam_width=w, max_hops=mh,
                history_capacity=hist, dedup=dedup, expand_r=expand_r,
            )
            return jnp.concatenate(
                [res.ids[:, :budget], res.cmps[:, None], res.hops[:, None]],
                axis=1,
            )

        self._compose_cache[key] = run
        return run

    def search(
        self,
        queries,
        k: int = 10,
        *,
        l_search: int | None = None,
        beam_width: int = 4,
        rerank_l: int | None = None,
        mode: str | None = None,
        max_hops: int | None = None,
        router_starts: int | None = None,
        query_dtype=None,
        row_wire=np.float32,
        batch_size: int | None = None,
    ):
        """Quantized traversal + host-staged full-precision rerank.

        Since round 5 this IS the composed pipelined path (`search_batched`
        with production defaults): one device program per sub-batch (router
        entry points when attached + quantized traversal + id pack),
        async host staging overlapping the next sub-batch's traversal.
        The r4 artifact measured the old multi-dispatch path far off the
        `search_batched` operating point; there is no reason to keep two."""
        g = self.graph
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        if router_starts is None:
            router_starts = 4 if self._router_ids is not None else 0
        bs = batch_size or getattr(g, "search_batch_size", None) or 4096
        return self.search_batched(
            queries, k, batch_size=bs, l_search=l_search,
            beam_width=beam_width, rerank_l=rerank_l, mode=mode,
            max_hops=max_hops, router_starts=router_starts,
            query_dtype=query_dtype, row_wire=row_wire,
        )

    _filtered_compose_cache: dict | None = None

    def _composed_filtered_fn(self, mode, accept_fn, l: int, w: int,
                              mh: int, budget: int, n_start: int,
                              wire: str | None, beta: float, method: str):
        """ONE jitted program per filtered-search config: device upcast +
        router top-k + quantized traversal (packed fat rows, sq, or pq —
        whichever the tier carries) with the inline beta filter
        (matched-only list at quantized distances) + match-id pack.  Same
        two-dispatch shape as the unfiltered composed path; the exact
        rerank runs over the staged matched rows (RerankAndFilter,
        `disk_provider.rs:292`)."""
        from diskann_tpu.graph.search import beam_search_scored

        g = self.graph
        sdef, _, expand_r = g._scorer_for_mode(mode)
        key = ("filtered", accept_fn, l, w, mh, budget, n_start, wire,
               beta, method, g.config, sdef.name)
        if self._filtered_compose_cache is None:
            self._filtered_compose_cache = {}
        fn = self._filtered_compose_cache.get(key)
        if fn is not None:
            return fn
        cfg = g.config
        metric = cfg.metric
        hist = cfg.history_capacity(l)

        @jax.jit
        def run(q_wire, sdata, adjacency, bits, router_ids, router_rows,
                start):
            q = q_wire.astype(jnp.float32)
            if n_start > 0:
                if mode in ("sq", "packed"):
                    qi, qscale, qsq = sdef.prep(sdata, q)
                    rc, raux = router_rows
                    dots = jax.lax.dot_general(
                        qi, rc, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    ).astype(jnp.float32) * qscale[:, None]
                    if metric == Metric.InnerProduct:
                        d = -dots
                    else:
                        d = qsq[:, None] + raux[None, :] - 2.0 * dots
                else:
                    rv, rsq = router_rows
                    d = distance_to_set(
                        q, rv, metric, x_sq_norms=rsq,
                        q_sq_norms=squared_norms(q)
                        if metric.needs_norms else None,
                    )
                _, top = jax.lax.top_k(-d, n_start)
                st = router_ids[top]
            else:
                st = start
            res = beam_search_scored(
                sdef, sdata, adjacency, st, q,
                l_search=l, beam_width=w, max_hops=mh,
                history_capacity=hist, dedup="list", expand_r=expand_r,
                accept_fn=accept_fn, accept_data=bits, filter_beta=beta,
                filter_mode=method,
            )
            return jnp.concatenate(
                [res.match_i[:, :budget], res.cmps[:, None],
                 res.hops[:, None]],
                axis=1,
            )

        self._filtered_compose_cache[key] = run
        return run

    def search_filtered(
        self,
        queries,
        predicate,
        k: int = 10,
        *,
        l_search: int | None = None,
        beam_width: int = 4,
        filter_beta: float | None = None,
        method: str = "inline",
        max_hops: int | None = None,
        router_starts: int | None = None,
        query_dtype=None,
        row_wire=np.float32,
        batch_size: int | None = None,
    ):
        """Label-filtered tiered search: packed int8 traversal with the
        inline beta filter (matched-only list collected at quantized
        distances), then the matched rows stage from host RAM for an EXACT
        rerank — the disk provider's RerankAndFilter flow
        (`disk_provider.rs:292`) on the HBM/host tiers.  Requires labels
        attached on the underlying graph.

        Runs the same composed-program + async-staging pipeline as the
        unfiltered path (round-5 unification): router entry points when
        attached, ONE traversal dispatch per sub-batch, batch i's staging
        and exact rerank overlapping batch i+1's traversal."""
        from diskann_tpu.filters import compile_accept, parse_predicate

        g = self.graph
        if getattr(g, "labels", None) is None:
            raise ValueError("attach labels on the graph first")
        if isinstance(predicate, str):
            predicate = parse_predicate(predicate)
        accept_fn = compile_accept(
            predicate, g.labels.vocab, g.state.capacity
        )
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        b = queries.shape[0]
        l = l_search or max(k, g.config.l_build)
        budget = min(self.io_limit or l, l)
        mh = max_hops or g.config.max_hops
        if router_starts is None:
            router_starts = 4 if self._router_ids is not None else 0
        n_start = router_starts if self._router_ids is not None else 0
        beta = filter_beta if filter_beta is not None else 0.5
        fmode, _, sdata, _, _ = self._traversal_scorer(None)
        fn = self._composed_filtered_fn(
            fmode, accept_fn, l, beam_width, mh, budget, n_start,
            np.dtype(query_dtype).name if query_dtype else None,
            beta, method,
        )
        if n_start > 0:
            _, *router_rows = self._router_table(fmode)
            router_rows = tuple(router_rows)
            router_ids = self._router_ids
        else:
            router_rows = (jnp.zeros((1,), jnp.float32),) * 2
            router_ids = jnp.zeros((1,), jnp.int32)
        start = g._start()
        bs = batch_size or getattr(g, "search_batch_size", None) or 4096

        out_d = np.full((b, k), np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int32)
        cmps = np.zeros((b,), np.int32)
        hops = np.zeros((b,), np.int32)
        offs = list(range(0, b, bs))
        pending = None
        for off in offs + [None]:
            if off is not None:
                qb = queries[off : off + bs]
                q_wire = jnp.asarray(
                    qb.astype(query_dtype) if query_dtype else qb
                )
                with span("tiered.traverse_filtered", offset=off,
                          rows=qb.shape[0]):
                    packed = fn(q_wire, sdata, g.state.adjacency,
                                g.labels.bits, router_ids, router_rows,
                                start)
                    arr = np.asarray(packed)
                stage_ids = arr[:, :budget]
                t0 = time.time()
                handle = self.store.fetch_async(np.maximum(stage_ids, 0))
                self.io_stats["rows_staged"] += int(stage_ids.size)
                self.io_stats["stage_s"] += time.time() - t0
                nxt = (off, qb.shape[0], stage_ids, handle, qb,
                       arr[:, budget], arr[:, budget + 1])
            else:
                nxt = None
            if pending is not None:
                poff, m, stage_ids, handle, qb, pc, ph = pending
                with span("tiered.stage_wait", offset=poff):
                    rows = self.store.fetch_wait(handle)
                d, i = _tiered_rerank(
                    jnp.asarray(qb),
                    jnp.asarray(rows.astype(row_wire, copy=False)),
                    jnp.asarray(stage_ids), g.state.valid,
                    g.config.metric, k,
                )
                out_d[poff : poff + m] = np.asarray(d)[:m]
                out_i[poff : poff + m] = np.asarray(i)[:m]
                cmps[poff : poff + m] = pc[:m]
                hops[poff : poff + m] = ph[:m]
            pending = nxt
        from diskann_tpu.graph.index import SearchStats

        return out_d, out_i, SearchStats(
            cmps=cmps, hops=hops, result_count=(out_i >= 0).sum(axis=1)
        )

    def search_batched(
        self,
        queries,
        k: int = 10,
        *,
        batch_size: int = 4096,
        l_search: int | None = None,
        beam_width: int = 4,
        rerank_l: int | None = None,
        mode: str | None = None,
        max_hops: int | None = None,
        router_starts: int = 0,
        query_dtype=None,
        row_wire=np.float32,
    ):
        """Software-pipelined tiered search: ONE composed device program
        per batch (router entry points + quantized traversal + id pack —
        the production quant-path recipe, `graph/index.py:968-1042`), then
        batch i's host staging (async native gather threads) and exact
        rerank overlap batch i+1's traversal — the TPU analogue of the disk
        tier's async sector reads overlapping PQ compute
        (`disk_provider.rs:683-722`).

        router_starts > 0 starts each query from its nearest sampled rows
        (`attach_router`) instead of the global medoid.  row_wire: dtype
        for the staged rows' host->device upload — the relay link runs
        ~54MB/s, so np.float16 halves the rerank upload at <=1e-3 relative
        distance error (ordering among the staged candidates only; the
        f32 default keeps search_batched exactly equal to search())."""
        g = self.graph
        queries = np.asarray(queries, np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        b = queries.shape[0]
        l = l_search or max(k, g.config.l_build)
        budget = min(self.io_limit or l, rerank_l or l, l)
        mode, _, sdata, _, _ = self._traversal_scorer(mode)
        mh = max_hops or g.config.max_hops
        n_start = router_starts if self._router_ids is not None else 0
        fn = self._composed_traverse_fn(
            mode, l, beam_width, mh, budget, n_start,
            np.dtype(query_dtype).name if query_dtype else None,
        )
        if n_start > 0:
            _, *router_rows = self._router_table(mode)
            router_rows = tuple(router_rows)
            router_ids = self._router_ids
        else:
            router_rows = (jnp.zeros((1,), jnp.float32),) * 2
            router_ids = jnp.zeros((1,), jnp.int32)
        start = g._start()

        out_d = np.full((b, k), np.inf, np.float32)
        out_i = np.full((b, k), -1, np.int32)
        cmps = np.zeros((b,), np.int32)
        hops = np.zeros((b,), np.int32)
        offs = list(range(0, b, batch_size))
        pending = None   # (off, m, stage_ids, handle, qb, cmps, hops)
        for idx, off in enumerate(offs + [None]):
            if off is not None:
                qb = queries[off : off + batch_size]
                q_wire = jnp.asarray(
                    qb.astype(query_dtype) if query_dtype else qb
                )
                with span("tiered.traverse", offset=off, rows=qb.shape[0]):
                    packed = fn(q_wire, sdata, g.state.adjacency,
                                router_ids, router_rows, start)
                    arr = np.asarray(packed)   # sync: traversal done
                ids, pc = arr[:, :budget], arr[:, budget]
                stage_ids = ids
                t0 = time.time()
                handle = self.store.fetch_async(np.maximum(stage_ids, 0))
                self.io_stats["rows_staged"] += int(stage_ids.size)
                self.io_stats["stage_s"] += time.time() - t0
                nxt = (off, qb.shape[0], stage_ids, handle, qb, pc,
                       arr[:, budget + 1])
            else:
                nxt = None
            if pending is not None:
                poff, m, stage_ids, handle, qb, pc, ph = pending
                with span("tiered.stage_wait", offset=poff):
                    rows = self.store.fetch_wait(handle)
                d, i = _tiered_rerank(
                    jnp.asarray(qb),
                    jnp.asarray(rows.astype(row_wire, copy=False)),
                    jnp.asarray(stage_ids), g.state.valid,
                    g.config.metric, k,
                )
                out_d[poff : poff + m] = np.asarray(d)[:m]
                out_i[poff : poff + m] = np.asarray(i)[:m]
                cmps[poff : poff + m] = pc[:m]
                hops[poff : poff + m] = ph[:m]
            pending = nxt
        from diskann_tpu.graph.index import SearchStats

        return out_d, out_i, SearchStats(
            cmps=cmps, hops=hops, result_count=(out_i >= 0).sum(axis=1)
        )


    # -------------------------------------------------------------- save/load
    def save(self, path: str, *, copy_vectors: bool | None = None) -> None:
        """Persist the whole tier: graph + packed layout (via
        `GraphIndex.save`) and the host vector store.  A file-backed store
        records its source path; an in-RAM store is written to
        ``vectors.fbin`` inside the record (on-disk index analogue of
        `diskann-disk/src/storage/disk_index_writer.rs` +
        `data_model/graph_header.rs:17-46`)."""
        import json
        import os

        from diskann_tpu.io_.fbin import write_fbin

        os.makedirs(path, exist_ok=True)
        self.graph.save(os.path.join(path, "graph"))
        store_meta = {"n": self.store.n, "dim": self.store.dim}
        src = getattr(self.store, "source_path", None)
        if copy_vectors is None:
            copy_vectors = src is None and self.store.vectors is not None
        if copy_vectors:
            write_fbin(
                os.path.join(path, "vectors.fbin"),
                np.asarray(self.store.vectors, np.float32)
                if self.store.vectors is not None
                else self.store.fetch(np.arange(self.store.n)),
            )
            store_meta["file"] = "vectors.fbin"
        else:
            store_meta["source_path"] = src
        with open(os.path.join(path, "tiered.json"), "w") as f:
            json.dump(
                {"format_version": 1, "io_limit": self.io_limit,
                 "store": store_meta},
                f, indent=2,
            )

    @classmethod
    def load(cls, path: str) -> "TieredIndex":
        import json
        import os

        with open(os.path.join(path, "tiered.json")) as f:
            meta = json.load(f)
        graph = GraphIndex.load(os.path.join(path, "graph"))
        sm = meta["store"]
        if "file" in sm:
            store = HostVectorStore.from_fbin(os.path.join(path, sm["file"]))
        elif sm.get("source_path"):
            store = HostVectorStore.from_fbin(sm["source_path"])
        else:
            raise ValueError("tiered record has no vector source")
        return cls(graph, store, io_limit=meta.get("io_limit"))


@partial(jax.jit, static_argnames=("metric", "k"))
def _tiered_rerank(queries, rows, ids, valid, metric: Metric, k: int):
    rows = rows.astype(jnp.float32)   # rows may arrive f16 (wire format)
    cap = valid.shape[0]
    ok = (ids >= 0) & valid[jnp.clip(ids, 0, cap - 1)]
    qsq = squared_norms(queries) if metric.needs_norms else None
    d = distance_to_set(queries, rows, metric, q_sq_norms=qsq)
    d = jnp.where(ok, d, jnp.inf)
    iid = jnp.where(ok, ids, -1)
    d, iid = jax.lax.sort((d, iid), dimension=-1, num_keys=1)
    return d[:, :k], iid[:, :k]
