"""Database-sharded index over a device mesh.

Design (TPU-native promotion of the reference's sharded build,
`diskann-disk/src/build/builder/core.rs:34-76`):

- The id space is split into ``n_shards`` contiguous ranges of
  ``cap_per_shard``; every slot additionally carries an EXTERNAL id, so one
  logical vector may live in several shards (the reference's 2-way overlap
  assignment, `diskann-disk/src/utils/partition.rs:23`) and results are
  deduplicated by external id at merge time.
- Every shard owns a full `GraphArrays` over its range, stacked on a leading
  axis that is sharded over the mesh's ``"shard"`` axis.  All build work is
  local to a device (`shard_map` over the batched 3-phase insert kernel);
  there is no cross-device traffic during construction — the same
  conflict-freedom the reference gets from per-shard in-memory builds.
- Search broadcasts the query batch, runs the local frontier-batched beam
  search per shard, converts results to external ids, then merges the
  per-shard top-k lists with ``jax.lax.all_gather`` over ICI followed by one
  multi-operand sort with adjacent-duplicate elimination (replacing the
  reference's host-side shard merge + id union).
- Deletes run shard-local too: mark + batched row repair + drop, fanned out
  with `shard_map` (IP-DiskANN semantics per shard).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from diskann_tpu.graph import state as graph_state
from diskann_tpu.graph.build import insert_batch
from diskann_tpu.graph.config import GraphConfig
from diskann_tpu.graph.search import beam_search
from diskann_tpu.graph.state import GraphArrays
from diskann_tpu.ops.distance import Metric, distance_to_set, squared_norms


def _stacked_alloc(n_shards, cap, dim, r_slack, dtype):
    one = graph_state.alloc(cap, dim, r_slack, dtype)
    return jax.tree.map(
        lambda a: jnp.broadcast_to(a[None], (n_shards,) + a.shape), one
    )


def _merge_topk_dedup(all_d, all_i, k):
    """[S, B, L] per-shard sorted lists (EXTERNAL ids) -> global top-k with
    duplicate external ids removed.  Copies of the same vector in different
    shards carry bitwise-identical distances (same formula, same bytes), so
    a (d, id) sort lands them adjacent where one shifted compare marks them."""
    s, b, l = all_d.shape
    md = jnp.transpose(all_d, (1, 0, 2)).reshape(b, s * l)
    mi = jnp.transpose(all_i, (1, 0, 2)).reshape(b, s * l)
    md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=2)
    prev = jnp.concatenate([jnp.full((b, 1), -2, jnp.int32), mi[:, :-1]], axis=1)
    dup = (mi == prev) & (mi >= 0)
    md = jnp.where(dup, jnp.inf, md)
    mi = jnp.where(dup, -1, mi)
    md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=1)
    return md[:, :k], mi[:, :k]


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "k", "l_search"),
)
def _sharded_search(
    mesh: Mesh,
    stacked: GraphArrays,
    ext,                      # [n_shards, cap] i32 external ids (-1 empty)
    ns,                       # [n_shards] i32 live counts
    starts,                   # [n_shards, 1] i32 local start ids
    queries,                  # [B, d] replicated
    *,
    config: GraphConfig,
    k: int,
    l_search: int,
):
    def local(st: GraphArrays, ext, n, start, q):
        st = jax.tree.map(lambda a: a[0], st)
        ext = ext[0]
        n, start = n[0], start[0]
        res = beam_search(
            st.vectors, st.sq_norms, st.adjacency, start, q,
            metric=config.metric,
            l_search=l_search,
            beam_width=config.beam_width,
            max_hops=config.max_hops,
        )
        cap = st.capacity
        safe = jnp.clip(res.ids, 0, cap - 1)
        ok = (res.ids >= 0) & st.valid[safe]
        eids = jnp.where(ok, ext[safe], -1)
        dd = jnp.where(ok, res.dists, jnp.inf)
        all_d = jax.lax.all_gather(dd, "shard")             # [S, B, L]
        all_i = jax.lax.all_gather(eids, "shard")
        md, mi = _merge_topk_dedup(all_d, all_i, k)
        return md, mi, res.cmps

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P("shard"), P("shard"), P("shard"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(stacked, ext, ns, starts, queries)


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "k", "l_search", "accept_fn",
                     "filter_beta"),
)
def _sharded_search_filtered(
    mesh: Mesh,
    stacked: GraphArrays,
    bits,                     # [n_shards, cap, W] u32 label bitsets
    ext,
    ns,
    starts,
    queries,
    *,
    config: GraphConfig,
    k: int,
    l_search: int,
    accept_fn,
    filter_beta: float,
):
    """Per-shard inline beta-filter search; the MATCHED lists (true
    distances, accepted nodes only) merge across the mesh with external-id
    dedup — the filter layer composed over the sharded serving layout."""
    from diskann_tpu.graph.scorers import full_precision_scorer
    from diskann_tpu.graph.search import beam_search_scored

    def local(st: GraphArrays, bits, ext, n, start, q):
        st = jax.tree.map(lambda a: a[0], st)
        bits, ext = bits[0], ext[0]
        n, start = n[0], start[0]
        sdef, sdata = full_precision_scorer(
            st.vectors, st.sq_norms, config.metric
        )
        res = beam_search_scored(
            sdef, sdata, st.adjacency, start, q,
            l_search=l_search,
            beam_width=config.beam_width,
            max_hops=config.max_hops,
            history_capacity=config.history_capacity(l_search),
            accept_fn=accept_fn, accept_data=bits,
            filter_beta=filter_beta, filter_mode="inline",
        )
        cap = st.capacity
        safe = jnp.clip(res.match_i, 0, cap - 1)
        ok = (res.match_i >= 0) & st.valid[safe]
        eids = jnp.where(ok, ext[safe], -1)
        dd = jnp.where(ok, res.match_d, jnp.inf)
        all_d = jax.lax.all_gather(dd, "shard")
        all_i = jax.lax.all_gather(eids, "shard")
        md, mi = _merge_topk_dedup(all_d, all_i, k)
        return md, mi, res.cmps

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P("shard"), P("shard"), P("shard"),
                  P("shard"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(stacked, bits, ext, ns, starts, queries)


@partial(jax.jit, static_argnames=("mesh", "config"))
def _sharded_insert(mesh, stacked, ext, ns, starts, batch, row_valid,
                    row_ext, config, packed=None):
    """batch: [n_shards, M, d] — rows routed to shards by the caller;
    row_ext: [n_shards, M] external ids for the new rows.

    Freed slots below each shard's high-water mark are RECYCLED first
    (the reference's freelist, `diskann-inmem/src/freelist.rs`), found on
    device: free positions compact to the front with one sort, fresh rows
    spill past the high-water mark.  When a per-shard packed layout is
    passed, `insert_batch` maintains it incrementally inside the same
    program (no re-attach)."""

    def local(st, ext, n, start, vecs, valid, rext, *p):
        st = jax.tree.map(lambda a: a[0], st)
        p = jax.tree.map(lambda a: a[0], p[0]) if p else None
        ext, n, start = ext[0], n[0], start[0]
        cap = st.capacity
        m = vecs.shape[1]
        valid0 = valid[0]
        iota = jnp.arange(cap, dtype=jnp.int32)
        free = (~st.valid) & (iota < n)                 # freed, below HWM
        fpos = jax.lax.sort(jnp.where(free, iota, cap))  # ascending frees
        nfree = free.astype(jnp.int32).sum()
        mv = valid0.astype(jnp.int32).sum()             # valid rows (prefix)
        take = jnp.minimum(nfree, mv)
        j = jnp.arange(m, dtype=jnp.int32)
        slots = jnp.where(j < take, fpos[:m], n + j - take)
        slots = jnp.where(valid0, slots, -1)
        st, p, stats = insert_batch(
            st, slots, vecs[0], valid0, start, config, p,
        )
        ext = ext.at[jnp.where(valid0, slots, cap)].set(
            rext[0], mode="drop"
        )
        new_n = n + (mv - take)
        new_start = graph_state.medoid(st, new_n)[None]
        st = jax.tree.map(lambda a: a[None], st)
        out_p = jax.tree.map(lambda a: a[None], p) if p is not None else ()
        return (st, ext[None], new_n[None], new_start[None], out_p,
                stats.cmps[None])

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    spec_packed = jax.tree.map(lambda _: P("shard"), packed)
    pk_args = (packed,) if packed is not None else ()
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P("shard"), P("shard"), P("shard"),
                  P("shard"), P("shard"), P("shard")) + (
            (spec_packed,) if packed is not None else ()
        ),
        out_specs=(spec_state, P("shard"), P("shard"), P("shard"),
                   spec_packed if packed is not None else (), P("shard")),
        check_vma=False,
    )(stacked, ext, ns, starts, batch, row_valid, row_ext, *pk_args)


@partial(jax.jit, static_argnames=("mesh", "config", "chunk"))
def _sharded_delete(mesh, stacked, ext, ns, dead_ext, config, packed=None,
                    chunk: int = 4096):
    """Shard-local IP-DiskANN delete BY EXTERNAL ID: each shard finds its
    own copies on device (membership test against its `ext` column — no
    host-side id map), marks them, repairs every referencing row, drops
    them, clears the ext slots, and refreshes the shard's medoid start
    (the old start node may BE one of the deleted rows — searching from a
    dead start silently craters recall).  dead_ext: [E] external ids (-1
    pad), replicated.  Returns (stacked, ext, starts, packed, per-shard
    deleted counts).

    Repair work is O(affected), not O(capacity): affected row ids compact
    to the front with one sort and a while_loop patches only the populated
    `chunk`-sized segments — the reference's multi_inplace_delete touches
    only discovered in-neighbors (`diskann/src/graph/index.rs:1338-1520`).
    When a per-shard packed layout is passed, its affected fat rows are
    refreshed IN the same program (no host-side re-attach)."""
    from diskann_tpu.graph import packed as pk
    from diskann_tpu.graph.delete import (
        drop_deleted_rows, patch_rows, rows_referencing_deleted,
    )

    def local(st, ext, n, dead_ext, *p):
        st = jax.tree.map(lambda a: a[0], st)
        p = jax.tree.map(lambda a: a[0], p[0]) if p else None
        ext, n = ext[0], n[0]
        cap = st.capacity
        e = dead_ext.shape[0]
        ch = min(512, e)
        # chunked membership scan bounds the [cap, ch] compare tensor
        def mstep(i, hit):
            seg = jax.lax.dynamic_slice(dead_ext, (i * ch,), (ch,))
            return hit | (
                (ext[:, None] == seg[None, :]) & (seg >= 0)[None, :]
            ).any(axis=1)

        hit = jax.lax.fori_loop(
            0, -(-e // ch), mstep, jnp.zeros((cap,), bool)
        )
        hit = hit & st.valid
        dcount = hit.astype(jnp.int32).sum()
        # mark: clear liveness + medoid running sum (mark_deleted semantics)
        removed = jnp.where(
            hit[:, None], st.vectors.astype(jnp.float32), 0.0
        ).sum(axis=0)
        st = st._replace(
            valid=st.valid & ~hit, vec_sum=st.vec_sum - removed
        )
        ext = jnp.where(hit, -1, ext)
        aff = rows_referencing_deleted(st)
        iota = jnp.arange(cap, dtype=jnp.int32)
        # compact affected row ids to the front; cap-sentinels sort last
        rows = jax.lax.sort(jnp.where(aff, iota, cap))
        rows = jnp.pad(rows, (0, chunk), constant_values=cap)
        n_aff = aff.astype(jnp.int32).sum()

        def cond(c):
            return c[0] * chunk < n_aff

        def body(c):
            i, s = c
            seg = jax.lax.dynamic_slice(rows, (i * chunk,), (chunk,))
            seg = jnp.where(seg >= cap, -1, seg)
            return i + 1, patch_rows(s, seg, config)

        _, st = jax.lax.while_loop(cond, body, (jnp.int32(0), st))
        st = drop_deleted_rows(st)
        if p is not None:
            # refresh the packed mirror for patched + dropped rows only
            dirty = aff | hit
            prows = jax.lax.sort(jnp.where(dirty, iota, cap))
            prows = jnp.pad(prows, (0, chunk), constant_values=cap)
            n_dirty = dirty.astype(jnp.int32).sum()

            def pcond(c):
                return c[0] * chunk < n_dirty

            def pbody(c):
                i, pp = c
                seg = jax.lax.dynamic_slice(prows, (i * chunk,), (chunk,))
                seg = jnp.where(seg >= cap, -1, seg)
                return i + 1, pk.refresh_rows(pp, st.adjacency, seg)

            _, p = jax.lax.while_loop(pcond, pbody, (jnp.int32(0), p))
            p = jax.tree.map(lambda a: a[None], p)
        out_p = p if p is not None else ()
        new_start = graph_state.medoid(st, n)[None]
        return (
            jax.tree.map(lambda a: a[None], st), ext[None], new_start[None],
            out_p, dcount[None],
        )

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    spec_packed = jax.tree.map(lambda _: P("shard"), packed)
    pk_args = (packed,) if packed is not None else ()
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P("shard"), P("shard"), P()) + (
            (spec_packed,) if packed is not None else ()
        ),
        out_specs=(spec_state, P("shard"), P("shard"),
                   spec_packed if packed is not None else (),
                   P("shard")),
        check_vma=False,
    )(stacked, ext, ns, dead_ext, *pk_args)


@partial(jax.jit, static_argnames=("mesh", "config", "dp"))
def _sharded_attach_packed(mesh, stacked, proj, pscale, pbias2, config, dp):
    """Build a per-shard packed sector layout: encode the local vectors and
    rebuild every local fat row — all shard-local (no collectives)."""
    from diskann_tpu.graph import packed as pk

    def local(st, proj, pscale, pbias2):
        st = jax.tree.map(lambda a: a[0], st)
        cap = st.capacity
        p = pk.alloc_packed(
            proj, pscale, pbias2, cap, config.max_degree_with_slack
        )
        ids = jnp.arange(cap, dtype=jnp.int32)
        codes, aux = pk.encode(p, st.vectors, config.metric)
        p = pk.set_self_codes(p, ids, codes, aux)
        bs = 65536
        for off in range(0, cap, bs):
            rows = jnp.arange(off, min(off + bs, cap), dtype=jnp.int32)
            p = pk.refresh_rows(p, st.adjacency, rows)
        return jax.tree.map(lambda a: a[None], p)

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P(), P(), P()),
        out_specs=jax.tree.map(
            lambda _: P("shard"),
            _packed_structure(proj, pscale, pbias2, stacked, config, dp),
        ),
        check_vma=False,
    )(stacked, proj, pscale, pbias2)


def _packed_structure(proj, pscale, pbias2, stacked, config, dp):
    """Pytree prototype matching _sharded_attach_packed's local output."""
    from diskann_tpu.graph import packed as pk

    cap = stacked.vectors.shape[1]
    rp = pk.padded_degree(config.max_degree_with_slack, dp)
    nwr = pk.n_wrows(rp, dp)
    return pk.PackedState(
        proj=proj, pscale=pscale, pbias2=pbias2,
        self_codes=jnp.zeros((1, cap, dp), jnp.int8),
        self_aux=jnp.zeros((1, cap), jnp.float32),
        rows=jnp.zeros((1, (cap + 1) * nwr, 128), jnp.int32),
        r_pack=rp,
    )


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "k", "l_search"),
)
def _sharded_search_packed(
    mesh, stacked, packed, ext, ns, starts, queries,
    *, config, k, l_search,
):
    """Packed (int8 fat-row) traversal per shard + local full-precision
    rerank, then one all_gather + dedup merge over the mesh — the
    single-chip production search at pod scale."""
    from diskann_tpu.graph.scorers import packed_scorer
    from diskann_tpu.graph.search import beam_search_scored

    def local(st, p, ext, n, start, q):
        st = jax.tree.map(lambda a: a[0], st)
        p = jax.tree.map(lambda a: a[0], p)
        ext, n, start = ext[0], n[0], start[0]
        sdef, sdata = packed_scorer(p, config.metric)
        res = beam_search_scored(
            sdef, sdata, st.adjacency, start, q,
            l_search=l_search,
            beam_width=config.beam_width,
            max_hops=config.max_hops,
            dedup="merge",
            expand_r=p.r_pack,
        )
        # local full-precision rerank before the merge (RerankAndFilter)
        cap = st.capacity
        safe = jnp.clip(res.ids, 0, cap - 1)
        cvec = st.vectors[safe]
        csq = st.sq_norms[safe]
        dd = distance_to_set(q, cvec, config.metric, x_sq_norms=csq)
        dd = jnp.where((res.ids >= 0) & st.valid[safe], dd, jnp.inf)
        dd, ii = jax.lax.sort((dd, jnp.where(res.ids >= 0, res.ids, -1)),
                              dimension=-1, num_keys=1)
        eids = jnp.where(ii >= 0, ext[jnp.clip(ii, 0, cap - 1)], -1)
        all_d = jax.lax.all_gather(dd[:, :k], "shard")
        all_i = jax.lax.all_gather(eids[:, :k], "shard")
        md, mi = _merge_topk_dedup(all_d, all_i, k)
        return md, mi, res.cmps

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    spec_packed = jax.tree.map(lambda _: P("shard"), packed)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, spec_packed, P("shard"), P("shard"),
                  P("shard"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(stacked, packed, ext, ns, starts, queries)


class ShardedGraphIndex:
    """A Vamana index partitioned across the devices of a mesh.

    Vectors are addressed by EXTERNAL id (assigned at insert, returned by
    `search`); one external id may be stored in several shards (overlap
    routing), and deletes remove every copy."""

    def __init__(
        self,
        mesh: Mesh,
        dim: int,
        config: GraphConfig | None = None,
        *,
        cap_per_shard: int = 4096,
        dtype=jnp.float32,
    ):
        self.mesh = mesh
        self.n_shards = mesh.shape["shard"]
        self.config = config or GraphConfig()
        self.dim = dim
        self.cap_per_shard = cap_per_shard
        self.dtype = dtype
        self._shard_sharding = NamedSharding(mesh, P("shard"))
        self.stacked = jax.device_put(
            _stacked_alloc(
                self.n_shards, cap_per_shard, dim,
                self.config.max_degree_with_slack, dtype,
            ),
            self._shard_sharding,
        )
        self.ns = jax.device_put(
            jnp.zeros((self.n_shards,), jnp.int32), self._shard_sharding
        )
        self.starts = jax.device_put(
            jnp.full((self.n_shards, 1), -1, jnp.int32), self._shard_sharding
        )
        self.ext = jax.device_put(
            jnp.full((self.n_shards, cap_per_shard), -1, jnp.int32),
            self._shard_sharding,
        )
        self.next_ext = 0
        # NOTE: there is deliberately no host-side external-id -> slot map:
        # lookups that need one (delete) run on device against the per-shard
        # `ext` columns, so host memory stays O(batch) at any index size
        self.n_deleted = 0
        # freed slots per shard, tracked as a device-side count only (the
        # freelist itself is derived on device from ~valid below ns)
        self._free_total = 0

    # ------------------------------------------------------------------ grow
    def grow(self, new_cap_per_shard: int) -> None:
        """Grow every shard's capacity (pad all stacked arrays)."""
        extra = new_cap_per_shard - self.cap_per_shard
        if extra <= 0:
            return
        st = self.stacked
        self.stacked = jax.device_put(
            GraphArrays(
                vectors=jnp.pad(st.vectors, ((0, 0), (0, extra), (0, 0))),
                sq_norms=jnp.pad(st.sq_norms, ((0, 0), (0, extra))),
                adjacency=jnp.pad(
                    st.adjacency, ((0, 0), (0, extra), (0, 0)),
                    constant_values=-1,
                ),
                degrees=jnp.pad(st.degrees, ((0, 0), (0, extra))),
                valid=jnp.pad(st.valid, ((0, 0), (0, extra))),
                vec_sum=st.vec_sum,
            ),
            self._shard_sharding,
        )
        self.ext = jax.device_put(
            jnp.pad(self.ext, ((0, 0), (0, extra)), constant_values=-1),
            self._shard_sharding,
        )
        self.cap_per_shard = new_cap_per_shard
        self._labels_stale = True
        if self.packed is not None:
            self.attach_packed(dp=int(self.packed.dp))

    # ---------------------------------------------------------------- insert
    def insert(
        self,
        vectors: np.ndarray,
        assignments: np.ndarray | None = None,
        *,
        on_overflow: str = "grow",
    ) -> np.ndarray:
        """Insert vectors, routing each to one or more shards.

        assignments: None (round-robin), [m] single-shard, or [m, overlap]
        (each row's `overlap` nearest shards from `kmeans_partition` — the
        reference's 2-way overlap, `partition.rs:23`).  Returns the external
        ids assigned to the rows.  on_overflow: "grow" doubles shard
        capacity; "error" raises — never silent loss."""
        vectors = np.asarray(vectors, np.float32)
        m = vectors.shape[0]
        if assignments is None:
            assignments = (np.arange(m) + self.next_ext) % self.n_shards
        assignments = np.asarray(assignments)
        if assignments.ndim == 1:
            assignments = assignments[:, None]
        ext_ids = np.arange(self.next_ext, self.next_ext + m, dtype=np.int64)

        # vectorized routing: dedup shard ids within each row, then group
        # (shard, row) pairs by shard with one stable argsort — O(m·overlap)
        # host work, no per-row Python loop
        a = np.sort(assignments, axis=1)
        keep = a >= 0
        keep[:, 1:] &= a[:, 1:] != a[:, :-1]
        pair_s = a[keep].astype(np.int64)                 # [P]
        pair_j = np.broadcast_to(
            np.arange(m)[:, None], a.shape
        )[keep]                                           # [P]
        order = np.argsort(pair_s, kind="stable")
        pair_s, pair_j = pair_s[order], pair_j[order]
        counts = np.bincount(pair_s, minlength=self.n_shards)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        col = np.arange(len(pair_s)) - offsets[pair_s]    # slot within shard

        ns_now = np.asarray(self.ns)
        need = int((ns_now + counts).max()) if len(pair_s) else 0
        if need > self.cap_per_shard:
            if on_overflow == "error":
                raise ValueError(
                    f"shard overflow: need {need} > cap {self.cap_per_shard}"
                )
            new_cap = max(int(need), self.cap_per_shard * 2)
            self.grow(new_cap)

        width = int(counts.max()) if len(pair_s) else 0
        if width == 0:
            return ext_ids
        # bucket the routed width so repeated inserts share ONE compiled
        # program: counts.max() of a routed batch varies call to call, and
        # an unbucketed [n_shards, width, d] shape would retrace/recompile
        # _sharded_insert every time (the -1/False padding makes the extra
        # columns no-ops)
        width = min(-(-width // 512) * 512, self.cap_per_shard)
        batch = np.zeros((self.n_shards, width, self.dim), np.float32)
        valid = np.zeros((self.n_shards, width), bool)
        rext = np.full((self.n_shards, width), -1, np.int32)
        batch[pair_s, col] = vectors[pair_j]
        valid[pair_s, col] = True
        rext[pair_s, col] = ext_ids[pair_j]
        (self.stacked, self.ext, self.ns, self.starts, new_packed,
         _) = _sharded_insert(
            self.mesh, self.stacked, self.ext, self.ns, self.starts,
            jnp.asarray(batch), jnp.asarray(valid), jnp.asarray(rext),
            self.config, self.packed,
        )
        if self.packed is not None:
            self.packed = new_packed
        self.next_ext += m
        self._labels_stale = True
        return ext_ids

    # ---------------------------------------------------------------- delete
    def delete(self, ext_ids) -> None:
        """Delete by external id — every shard finds and removes its copies
        ON DEVICE (membership scan of its `ext` column; no host id map) and
        repairs its referencing rows locally (IP-DiskANN per shard) in
        O(affected) work (compacted row patching — see `_sharded_delete`).
        An attached packed layout has its dirty fat rows refreshed inside
        the same program (no full re-attach).  Freed slots are recycled by
        later inserts (per-shard freelist)."""
        ext_ids = np.unique(np.asarray(ext_ids).ravel().astype(np.int32))
        if len(ext_ids) == 0:
            return
        pad = (-len(ext_ids)) % 512
        dead_ext = np.pad(ext_ids, (0, pad), constant_values=-1)
        (self.stacked, self.ext, self.starts, new_packed,
         dcount) = _sharded_delete(
            self.mesh, self.stacked, self.ext, self.ns,
            jnp.asarray(dead_ext), self.config, self.packed,
        )
        if self.packed is not None:
            self.packed = new_packed
        self._free_total += int(np.asarray(dcount).sum())
        self.n_deleted += len(ext_ids)

    def attach_packed(self, *, dp: int = 64, train_sample=None) -> None:
        """Build per-shard packed sector layouts (enables mode="packed"
        search — int8 fat-row traversal on every shard)."""
        from diskann_tpu.graph import packed as pk

        if train_sample is None:
            # sample live rows from EVERY shard (capacity rows past each
            # shard's fill count are zeros and would skew the projection)
            ns = np.asarray(self.ns)
            per = max(1, int(np.ceil(256 / max(len(ns), 1))))
            parts = []
            for s in range(len(ns)):
                n_s = int(ns[s])
                if n_s > 0:
                    vs = np.asarray(self.stacked.vectors[s][: min(n_s, per)])
                    parts.append(vs)
            train_sample = (
                np.concatenate(parts, axis=0) if parts
                else np.zeros((1, self.dim), np.float32)
            )
        proj, pscale, pbias2 = pk.train_packed(
            np.asarray(train_sample, np.float32), min(dp, self.dim),
            self.config.metric,
        )
        self.packed = _sharded_attach_packed(
            self.mesh, self.stacked, proj, pscale, pbias2,
            self.config, proj.shape[1],
        )

    packed = None

    # ---------------------------------------------------------------- labels
    def attach_labels(self, labels_per_ext: list) -> None:
        """Assign labels keyed by EXTERNAL id (labels_per_ext[e] = list of
        label strings for external id e).  Each shard stores the bitset
        rows for its local slots, so filtered search runs shard-local.
        External ids beyond the list (or added later) carry no labels and
        never match a predicate."""
        self._labels_per_ext = list(labels_per_ext)
        self._labels_stale = True
        self._rebuild_label_bits()

    def _rebuild_label_bits(self) -> None:
        """(Re)scatter label bitset rows to each shard's CURRENT slots —
        insert/grow move/extend slots, so a stale snapshot would clamp
        out-of-range gathers onto arbitrary rows (silent predicate
        violations)."""
        from diskann_tpu.filters import LabelSet

        lists = self._labels_per_ext
        # cover every assigned external id; later ones are unlabeled
        n_ext = max(len(lists), self.next_ext, 1)
        if len(lists) < n_ext:
            lists = lists + [[] for _ in range(n_ext - len(lists))]
        ls = LabelSet.from_lists(lists, capacity=n_ext)
        self.label_vocab = ls.vocab
        ext = jnp.asarray(self.ext)                       # [S, cap]
        safe = jnp.clip(ext, 0, ls.bits.shape[0] - 1)
        bits = jnp.where(
            (ext >= 0)[:, :, None], ls.bits[safe], 0
        ).astype(ls.bits.dtype)                           # [S, cap, W]
        self.label_bits = jax.device_put(bits, self._shard_sharding)
        self._labels_stale = False

    label_bits = None
    label_vocab = None
    _labels_per_ext = None
    _labels_stale = False

    def search_filtered(self, queries, predicate, k: int = 10, *,
                        l_search: int | None = None,
                        filter_beta: float | None = None):
        """Label-filtered k-NN over every shard (inline beta filter,
        matched lists merged with external-id dedup).  Returns
        (true dists [B,k], EXTERNAL ids [B,k], cmps)."""
        from diskann_tpu.filters import compile_accept, parse_predicate

        if self.label_bits is None:
            raise ValueError("attach_labels first")
        if self._labels_stale:
            self._rebuild_label_bits()
        if isinstance(predicate, str):
            predicate = parse_predicate(predicate)
        accept_fn = compile_accept(
            predicate, self.label_vocab, self.cap_per_shard
        )
        queries = jnp.asarray(np.asarray(queries, np.float32))
        l = l_search or max(k, self.config.l_build)
        d, i, cmps = _sharded_search_filtered(
            self.mesh, self.stacked, self.label_bits, self.ext, self.ns,
            self.starts, queries,
            config=self.config, k=k, l_search=l, accept_fn=accept_fn,
            filter_beta=filter_beta if filter_beta is not None else 0.5,
        )
        return np.asarray(d), np.asarray(i), np.asarray(cmps)

    # ---------------------------------------------------------------- search
    def search(self, queries, k: int, *, l_search: int | None = None,
               mode: str = "full"):
        """Returns (dists [B,k], EXTERNAL ids [B,k], cmps)."""
        queries = jnp.asarray(np.asarray(queries, np.float32))
        l = l_search or max(k, self.config.l_build)
        if mode == "packed":
            if self.packed is None:
                self.attach_packed()
            d, i, cmps = _sharded_search_packed(
                self.mesh, self.stacked, self.packed, self.ext, self.ns,
                self.starts, queries,
                config=self.config, k=k, l_search=l,
            )
        else:
            d, i, cmps = _sharded_search(
                self.mesh, self.stacked, self.ext, self.ns, self.starts,
                queries,
                config=self.config, k=k, l_search=l,
            )
        return np.asarray(d), np.asarray(i), np.asarray(cmps)

    def search_range(self, queries, radius: float, *,
                     l_init: int | None = None, l_max: int = 1024):
        """All EXTERNAL ids within `radius` of each query (two-round L
        doubling over every shard, overlap duplicates deduped at merge)."""
        from diskann_tpu.graph.modes import range_search

        return range_search(self, queries, radius, l_init=l_init,
                            l_max=l_max)

    # -------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        """Persist all shards + the external-id map (merged-index analogue of
        `MergedVamanaIndexBuilder` output, `disk_index_writer.rs`)."""
        from diskann_tpu.io_.record import save_record

        cfg = self.config
        save_record(
            path,
            kind="sharded_graph_index",
            meta={
                "n_shards": self.n_shards,
                "dim": self.dim,
                "cap_per_shard": self.cap_per_shard,
                "next_ext": self.next_ext,
                "n_deleted": self.n_deleted,
                "free_total": self._free_total,
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
            },
            arrays={
                "vectors": np.asarray(self.stacked.vectors),
                "sq_norms": np.asarray(self.stacked.sq_norms),
                "adjacency": np.asarray(self.stacked.adjacency),
                "degrees": np.asarray(self.stacked.degrees),
                "valid": np.asarray(self.stacked.valid),
                "vec_sum": np.asarray(self.stacked.vec_sum),
                "ext": np.asarray(self.ext),
                "ns": np.asarray(self.ns),
                "starts": np.asarray(self.starts),
            },
        )

    @classmethod
    def load(cls, mesh: Mesh, path: str) -> "ShardedGraphIndex":
        from diskann_tpu.io_.record import load_record

        manifest, arrays = load_record(path)
        meta = manifest["meta"]
        if meta["n_shards"] != mesh.shape["shard"]:
            raise ValueError(
                f"record has {meta['n_shards']} shards, mesh has "
                f"{mesh.shape['shard']}"
            )
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
        idx = cls(mesh, meta["dim"], cfg,
                  cap_per_shard=meta["cap_per_shard"])
        sh = idx._shard_sharding
        idx.stacked = jax.device_put(
            GraphArrays(
                vectors=jnp.asarray(arrays["vectors"]),
                sq_norms=jnp.asarray(arrays["sq_norms"]),
                adjacency=jnp.asarray(arrays["adjacency"]),
                degrees=jnp.asarray(arrays["degrees"]),
                valid=jnp.asarray(arrays["valid"]),
                vec_sum=jnp.asarray(arrays["vec_sum"]),
            ),
            sh,
        )
        idx.ext = jax.device_put(jnp.asarray(arrays["ext"]), sh)
        idx.ns = jax.device_put(jnp.asarray(arrays["ns"]), sh)
        idx.starts = jax.device_put(jnp.asarray(arrays["starts"]), sh)
        idx.next_ext = meta["next_ext"]
        idx.n_deleted = meta.get("n_deleted", 0)
        idx._free_total = meta.get("free_total", 0)
        return idx


def sharded_flat_search(
    mesh: Mesh,
    vectors,          # [N, d] sharded or shardable on axis 0
    queries,          # [B, d]
    k: int,
    metric: Metric = Metric.L2,
):
    """Exact top-k over a database sharded across devices: local distance
    matmul + local top-k, then all-gather + merge (the collective analogue of
    the flat scan, `diskann/src/flat/mod.rs`)."""
    n, d = vectors.shape
    n_dev = mesh.shape["shard"]
    pad = (-n) % n_dev
    if pad:
        vectors = jnp.pad(vectors, ((0, pad), (0, 0)))
    local_n = (n + pad) // n_dev

    def local(v, q):
        sq = squared_norms(v)
        dist = distance_to_set(q, v, metric, x_sq_norms=sq)
        shard = jax.lax.axis_index("shard")
        base = shard * local_n
        ids = base + jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
        dist = jnp.where(ids < n, dist, jnp.inf)
        kk = min(k, v.shape[0])
        dd, ii = jax.lax.sort((dist, ids), dimension=-1, num_keys=1)
        dd, ii = dd[:, :kk], ii[:, :kk]
        all_d = jax.lax.all_gather(dd, "shard")
        all_i = jax.lax.all_gather(ii, "shard")
        s, b, l = all_d.shape
        md = jnp.transpose(all_d, (1, 0, 2)).reshape(b, s * l)
        mi = jnp.transpose(all_i, (1, 0, 2)).reshape(b, s * l)
        md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=1)
        out = min(k, s * l)
        return md[:, :out], mi[:, :out]

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shard"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)(vectors, queries)
