"""HBM-budget merged Vamana build — the TPU analogue of the reference's
`MergedVamanaIndexBuilder` (`diskann-disk/src/build/builder/core.rs:34-76`,
`diskann-disk/src/utils/partition.rs:23`).

When a dataset's build working set exceeds the HBM budget, k-means it into
shards, assign every vector to its `overlap` (2) nearest shards, build each
shard independently on-device (only one shard resident at a time), and merge
the per-shard adjacency by id union into ONE graph whose full-precision
vectors live host-side (`TieredIndex`) with packed int8 codes in HBM.

TPU-native merge trick: while a shard's vectors are still device-resident
right after its build, ONE batched gather+dot computes every adjacency
edge's exact length.  The host merge of the two per-shard edge lists then
needs no distance math at all — dedup by id (keep min), sort by length,
cap at R.  (The reference merge interleaves shard edge lists and dedups,
`core.rs:66`; ranking by exact length is strictly no worse.)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph import packed as packed_mod
from diskann_tpu.graph import state as graph_state
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.index import GraphIndex
from diskann_tpu.ops.distance import Metric, distance_to_set
from diskann_tpu.parallel.partition import estimate_build_ram_bytes
from diskann_tpu.quant.kmeans import kmeans
from diskann_tpu.tiered.index import HostVectorStore, TieredIndex


def _assign_chunked(vectors: np.ndarray, centers, overlap: int,
                    chunk: int = 1 << 18) -> np.ndarray:
    """[N, overlap] nearest shard ids per row, closest first; vectors stream
    through the device one chunk at a time (the whole array need not fit)."""
    n = vectors.shape[0]
    out = np.empty((n, overlap), np.int32)
    centers = jnp.asarray(centers, jnp.float32)

    @jax.jit
    def nearest(xc):
        d = distance_to_set(xc, centers, Metric.L2)
        _, idx = jax.lax.top_k(-d, overlap)
        return idx

    for lo in range(0, n, chunk):
        xc = jnp.asarray(np.asarray(vectors[lo:lo + chunk], np.float32))
        out[lo:lo + xc.shape[0]] = np.asarray(nearest(xc))
    return out


def _edge_lengths(vectors, sq_norms, adjacency, *, chunk: int = 32768):
    """Exact length of every adjacency edge: [ns, Rs] f32, inf for empties.
    Runs while the shard's vectors are still device-resident.

    Chunked over rows: the naive all-rows gather materializes an
    [ns, Rs, d] f32 block — 44GB at a 20M/24-shard build (1.67M rows x 52
    edges x 128 dims) — so rows stream through in `chunk`-sized tiles
    (~870MB peak) into a [ns, Rs] output.  The tail tile clamps its start;
    overlapped rows just recompute identical lengths."""
    return _edge_lengths_jit(
        vectors, sq_norms, adjacency,
        chunk=min(chunk, adjacency.shape[0]),
    )


@partial(jax.jit, static_argnames=("chunk",))
def _edge_lengths_jit(vectors, sq_norms, adjacency, *, chunk: int):
    ns = vectors.shape[0]
    nrows = adjacency.shape[0]
    out = jnp.full(adjacency.shape, jnp.inf, jnp.float32)
    num_chunks = (nrows + chunk - 1) // chunk

    def body(c, out):
        start = jnp.minimum(c * chunk, nrows - chunk)
        adj = jax.lax.dynamic_slice_in_dim(adjacency, start, chunk, axis=0)
        v = jax.lax.dynamic_slice_in_dim(vectors, start, chunk, axis=0)
        sq = jax.lax.dynamic_slice_in_dim(sq_norms, start, chunk, axis=0)
        safe = jnp.clip(adj, 0, ns - 1)
        nb = vectors[safe]                                # [chunk, Rs, d]
        dots = jnp.einsum(
            "nd,nrd->nr", v, nb, precision=jax.lax.Precision.HIGHEST
        )
        d2 = sq[:, None] + sq_norms[safe] - 2.0 * dots
        res = jnp.where(adj >= 0, jnp.maximum(d2, 0.0), jnp.inf)
        return jax.lax.dynamic_update_slice(out, res, (start, jnp.int32(0)))

    return jax.lax.fori_loop(0, num_chunks, body, out)


_RANK_PAD = 2**30   # rank sentinel for empty slots


def _merge_rows(ids_a, r_a, d_a, ids_b, r_b, d_b, cap: int):
    """Vectorized host merge of two edge lists per row: dedup by id (keep
    min rank), drop self/-1, RANK-INTERLEAVE (sort by each edge's position
    in its source shard's RobustPrune output, exact length as tiebreak),
    keep `cap`.

    Rank-interleaving — the reference's merge semantics (`core.rs:66`
    alternates shard edge lists) — preserves each shard's alpha-diversity
    ordering.  Ranking by raw length instead collapses when 3+ lists merge:
    the globally-shortest `cap` edges cluster on one side of the node
    (measured: overlap=3 recall 0.81 vs 0.96 for overlap=2 on the same
    data with the length-ranked merge; rank-interleaved restores it).
    Returns (ids, ranks, lengths) so a row seen by 3+ shards (overlap > 2)
    folds each new shard's list into its running merge."""
    ids = np.concatenate([ids_a, ids_b], axis=1)          # [M, 2Rs]
    rs = np.concatenate([r_a, r_b], axis=1)
    ds = np.concatenate([d_a, d_b], axis=1)
    ds = np.where(ids >= 0, ds, np.inf)
    rs = np.where(ids >= 0, rs, _RANK_PAD)
    # sort by (id, rank, dist) so duplicate ids land adjacent, best first
    order = np.lexsort((ds, rs, ids), axis=1)
    ids = np.take_along_axis(ids, order, axis=1)
    rs = np.take_along_axis(rs, order, axis=1)
    ds = np.take_along_axis(ds, order, axis=1)
    dup = np.zeros_like(ids, bool)
    dup[:, 1:] = ids[:, 1:] == ids[:, :-1]
    invalid = dup | (ids < 0)
    ds = np.where(invalid, np.inf, ds)
    rs = np.where(invalid, _RANK_PAD, rs)
    # interleave: rank first, exact length breaks rank ties across shards
    order = np.lexsort((ds, rs), axis=1)[:, :cap]
    ids = np.take_along_axis(ids, order, axis=1)
    rs = np.take_along_axis(rs, order, axis=1)
    ds = np.take_along_axis(ds, order, axis=1)
    return np.where(np.isfinite(ds), ids, -1), rs, ds


def _pad_cols(a: np.ndarray, width: int, fill) -> np.ndarray:
    return np.pad(a, ((0, 0), (0, width - a.shape[1])), constant_values=fill)


def plan_shards(n: int, dim: int, r_slack: int, *, dp: int, overlap: int,
                hbm_budget_bytes: int) -> int:
    """Number of shards so each shard's build working set fits the budget
    (`estimate_build_index_ram_usage`, core.rs:41-63)."""
    per_pt = estimate_build_ram_bytes(1 << 20, dim, r_slack, dp) / (1 << 20)
    budget_pts = max(int(hbm_budget_bytes / per_pt), 1)
    return max(math.ceil(n * overlap / budget_pts), 1)


def build_merged(
    vectors: np.ndarray,
    config: GraphConfig | None = None,
    *,
    hbm_budget_bytes: int | None = None,
    n_shards: int | None = None,
    overlap: int = 2,
    dp: int = 64,
    insert_batch_size: int = 4096,
    train_points: int = 1 << 16,
    seed: int = 0,
    verbose: bool = False,
    codes: str = "packed",
    pq_chunks: int = 32,
    pq_centers: int = 256,
    adj_width: int | None = None,
    checkpoint_dir: str | None = None,
    **build_kw,
) -> TieredIndex:
    """Build a `TieredIndex` for a dataset whose build does not fit HBM.

    `vectors` stays a host array throughout; at most one shard's working set
    is device-resident at a time.  With `n_shards` unset, the shard count
    comes from `hbm_budget_bytes` (default: 60% of the device's memory).
    If everything fits in one shard, delegates to
    `TieredIndex.build_from_host`.

    codes: the HBM-resident traversal representation of the merged index.
    "packed" (fat rows, ~nwr*512 B/point) is the fastest search but caps at
    a few million points per chip; "sq" keeps full-dimension int8 codes
    ([N, d] + adjacency — e.g. 6.7GB at 20M x 128), the near-exact
    traversal representation (the dp=128 lesson: full-dim int8 ordering
    shifts the whole operating point to small L / few hops); "pq" keeps
    [N, pq_chunks] uint8 ADC codes — the reference disk tier's PQ-in-RAM
    shape (`disk_provider.rs:634-654`) for 100M-class datasets
    (pq_centers=16 selects 4-bit PQ with the fused masked-reduction ADC,
    orders faster per hop than 8-bit LUT gathers at equal code bytes).

    adj_width: store the merged adjacency truncated to this many columns
    (default r_slack).  The merged tier is read-only, so the slack columns
    — backedge headroom the builder needed — are pure HBM waste at search
    time: at 50M x R=40, [N, r_slack=52] i32 is 10.4GB vs 8GB truncated.
    Rows are truncated in rank order (the shard prune's selection order),
    so what drops is exactly the lowest-priority slack edges.

    checkpoint_dir: make the multi-hour sharded build resumable — the
    merge arrays live in memmapped .npy files there, and a progress file
    records completed shards; a restarted build with the same arguments
    skips them (the k-means seed makes the partition deterministic).  The
    relay to the shared chip has wedged for hours at a time (CLAUDE.md);
    an 80-shard build must survive that.
    """
    vectors = np.asarray(vectors, np.float32)
    n, dim = vectors.shape
    config = config or GraphConfig()
    r_slack = config.max_degree_with_slack
    if n_shards is None:
        if hbm_budget_bytes is None:
            stats = jax.devices()[0].memory_stats() or {}
            total = stats.get("bytes_limit", 16 * (1 << 30))
            hbm_budget_bytes = int(total * 0.6)
        n_shards = plan_shards(
            n, dim, r_slack, dp=dp, overlap=overlap,
            hbm_budget_bytes=hbm_budget_bytes,
        )
        if n_shards > 1:
            # n_shards <= overlap is degenerate (every shard holds every
            # vector); the smallest useful split is overlap + 1
            n_shards = max(n_shards, overlap + 1)
    if n_shards <= 1:
        return TieredIndex.build_from_host(
            vectors, config, dp=dp, insert_batch_size=insert_batch_size,
            build_mode="packed", packed_dp=dp, **build_kw,
        )

    log = (lambda *a: print("[merged]", *a)) if verbose else (lambda *a: None)

    # ---- partition: k-means on a sample, chunked overlap-2 assignment ----
    rng = np.random.default_rng(seed)
    sample = vectors[rng.choice(n, size=min(train_points, n), replace=False)]
    centers, _ = kmeans(
        jax.random.key(seed), jnp.asarray(sample), n_shards,
        max_train_points=train_points,
    )
    assign = _assign_chunked(vectors, centers, overlap)
    log(f"partitioned n={n} into {n_shards} shards (overlap={overlap})")

    # ---- per-shard build; merge into the global adjacency as we go ----
    cap = max(n, insert_batch_size)
    done_shards: set[int] = set()
    if checkpoint_dir:
        import os

        from numpy.lib.format import open_memmap

        os.makedirs(checkpoint_dir, exist_ok=True)
        prog_path = os.path.join(checkpoint_dir, "shards_done.txt")
        fresh_ckpt = not os.path.exists(
            os.path.join(checkpoint_dir, "merged.npy")
        )

        def _mm(name, dtype, shape, fill):
            p = os.path.join(checkpoint_dir, name)
            if fresh_ckpt:
                a = open_memmap(p, mode="w+", dtype=dtype, shape=shape)
                a[:] = fill
            else:
                a = open_memmap(p, mode="r+")
                assert a.shape == shape, (name, a.shape, shape)
            return a

        merged = _mm("merged.npy", np.int32, (n, r_slack), -1)
        merged_r = _mm("merged_r.npy", np.int32, (n, r_slack), _RANK_PAD)
        merged_d = _mm("merged_d.npy", np.float32, (n, r_slack), np.inf)
        seen = _mm("seen.npy", bool, (n,), False)
        if not fresh_ckpt and os.path.exists(prog_path):
            with open(prog_path) as f:
                done_shards = {int(v) for v in f.read().split()}
            log(f"resuming: shards {sorted(done_shards)} already merged")
    else:
        merged = np.full((n, r_slack), -1, np.int32)
        merged_r = np.full((n, r_slack), _RANK_PAD, np.int32)
        merged_d = np.full((n, r_slack), np.inf, np.float32)
        seen = np.zeros((n,), bool)
    # uniform per-shard capacity: every shard's arrays share ONE shape so
    # the remote-compiled build/search kernels are reused across all shards
    # (per-shard shapes would recompile the whole pipeline every shard)
    shard_sizes = [
        int(((assign == s).any(axis=1)).sum()) for s in range(n_shards)
    ]
    shard_cap = -(-max(shard_sizes + [insert_batch_size])
                  // insert_batch_size) * insert_batch_size
    for s in range(n_shards):
        if s in done_shards:
            continue
        rows = np.nonzero((assign == s).any(axis=1))[0].astype(np.int64)
        if rows.size == 0:
            continue
        sub = vectors[rows]
        idx = GraphIndex.build(
            sub, config, insert_batch_size=min(insert_batch_size, len(rows)),
            build_mode="packed", packed_dp=dp, capacity=shard_cap,
            **build_kw,
        )
        ns = len(rows)
        lengths = np.asarray(
            _edge_lengths(
                idx.state.vectors, idx.state.sq_norms,
                idx.state.adjacency,
            )
        )[:ns]
        adj_local = np.asarray(idx.state.adjacency[:ns])
        del idx  # free the shard's device buffers before the next build
        adj_global = np.where(adj_local >= 0, rows[np.clip(adj_local, 0, ns - 1)],
                              -1).astype(np.int32)
        old = seen[rows]
        fresh = rows[~old]
        # an edge's rank = its position in this shard's RobustPrune output
        ranks = np.broadcast_to(
            np.arange(adj_global.shape[1], dtype=np.int32), adj_global.shape
        )
        ranks = np.where(adj_global >= 0, ranks, _RANK_PAD)
        merged[fresh] = adj_global[~old]
        merged_r[fresh] = ranks[~old]
        merged_d[fresh] = lengths[~old]
        both = rows[old]
        if both.size:
            # pairwise merge, repeated once per extra shard a row belongs
            # to (overlap > 2, partition.rs:23): each new shard's list
            # folds into the row's running (ids, ranks, lengths)
            mi, mr, md = _merge_rows(
                merged[both], merged_r[both], merged_d[both],
                adj_global[old], ranks[old], lengths[old],
                config.max_degree,
            )
            merged[both] = _pad_cols(mi, r_slack, -1)
            merged_r[both] = _pad_cols(mr, r_slack, _RANK_PAD)
            merged_d[both] = _pad_cols(md, r_slack, np.inf)
        seen[rows] = True
        if checkpoint_dir:
            for a in (merged, merged_r, merged_d, seen):
                a.flush()
            with open(prog_path, "a") as f:
                f.write(f"{s}\n")
        log(f"shard {s}: built {ns} pts, merged")

    # ---- assemble the tiered graph shell (vectors stay host-side) ----
    graph = GraphIndex.__new__(GraphIndex)
    graph.config = config
    graph.dim = dim
    graph.dtype = jnp.float32
    graph.insert_batch_size = insert_batch_size
    graph.search_batch_size = build_kw.get("search_batch_size", 4096)
    graph.build_backedge_src_cap = 64
    graph.n = n
    graph.n_deleted = 0
    graph.free_slots = []
    graph._start_ids = None
    graph.packed = None
    graph.last_insert_stats = None
    graph._cached_start = None
    graph._auto_start = None
    graph._router_ids = None
    aw = min(adj_width or r_slack, r_slack)
    adj_host = merged[:, :aw]   # rank-ordered rows: slice keeps the best aw
    adj_dev = jnp.asarray(np.pad(adj_host, ((0, cap - n), (0, 0)),
                                 constant_values=-1))
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    graph.state = graph_state.GraphArrays(
        vectors=jnp.zeros((1, dim), jnp.float32),     # dropped (tiered)
        sq_norms=jnp.zeros((1,), jnp.float32),
        adjacency=adj_dev,
        degrees=jnp.pad(
            jnp.asarray((adj_host >= 0).sum(axis=1).astype(np.int32)),
            (0, cap - n),
        ),
        valid=jnp.asarray(valid),
        vec_sum=jnp.asarray(vectors.sum(axis=0, dtype=np.float64)
                            .astype(np.float32)),
    )
    graph._hbm_vectors_dropped = True

    if codes == "pq":
        # ---- PQ ADC codes: the 100M-class traversal representation ----
        from diskann_tpu.quant.pq import train_pq

        pq = train_pq(
            jax.random.key(seed), sample, n_chunks=pq_chunks,
            n_centers=pq_centers, max_train_points=train_points,
        )
        graph.pq = pq
        code_rows = np.zeros((cap, pq.n_chunks), np.uint8)
        chunk = 1 << 18
        for lo in range(0, n, chunk):
            code_rows[lo:lo + chunk] = np.asarray(
                pq.encode(vectors[lo:lo + chunk])
            )
        graph.pq_codes = jnp.asarray(code_rows)
    elif codes == "sq":
        # ---- full-dim int8 SQ codes: near-exact traversal ordering ----
        from diskann_tpu.graph.scorers import sq_aux_norms, sq_center_codes
        from diskann_tpu.quant.scalar import train_scalar

        sq = train_scalar(sample, n_bits=8, sigma=4.0)
        graph.sq = sq
        code_rows = np.zeros((cap, dim), np.int8)
        aux_rows = np.zeros((cap,), np.float32)
        chunk = 1 << 18
        bias2 = None
        for lo in range(0, n, chunk):
            cu8 = sq.encode(jnp.asarray(vectors[lo:lo + chunk]))
            ci8, bias2 = sq_center_codes(cu8, sq.scale, sq.bias)
            code_rows[lo:lo + chunk] = np.asarray(ci8)
            aux_rows[lo:lo + chunk] = np.asarray(sq_aux_norms(ci8, sq.scale))
        graph.sq_codes = jnp.asarray(code_rows)
        graph.sq_bias2 = bias2
        graph.sq_aux = jnp.asarray(aux_rows)
    else:
        # ---- packed fat-row codes, chunk-encoded from host ----
        proj, pscale, pbias2 = packed_mod.train_packed(sample, min(dp, dim),
                                                       config.metric)
        packed = packed_mod.alloc_packed(proj, pscale, pbias2, cap, aw)
        chunk = 1 << 17
        prev_sync = None  # one-behind barrier: unsynced donated-update
        # loops enqueue every chunk's transients at once and OOM (CLAUDE.md)
        for lo in range(0, n, chunk):
            xc = jnp.asarray(vectors[lo:lo + chunk])
            cds, aux = packed_mod.encode(packed, xc, config.metric)
            ids = jnp.arange(lo, lo + xc.shape[0], dtype=jnp.int32)
            packed = packed_mod.set_self_codes_donated(packed, ids, cds, aux)
            if prev_sync is not None:
                np.asarray(prev_sync)
            prev_sync = packed.self_aux[:1]
        for lo in range(0, n, chunk):
            ids = jnp.arange(lo, min(lo + chunk, n), dtype=jnp.int32)
            packed = packed_mod.refresh_rows_donated(
                packed, graph.state.adjacency, ids
            )
            if prev_sync is not None:
                np.asarray(prev_sync)
            prev_sync = packed.rows[:1, :1]
        graph.packed = packed

    # ---- entry point: medoid approximated host-side (vectors not in HBM) --
    mu = vectors.mean(axis=0)
    probe = vectors[:: max(n // (1 << 16), 1)]
    medoid_row = int(np.argmin(((probe - mu) ** 2).sum(axis=1)))
    graph._cached_start = jnp.asarray(
        [medoid_row * max(n // (1 << 16), 1)], jnp.int32
    )

    log("assembled merged tiered index")
    return TieredIndex(graph, HostVectorStore(vectors))
