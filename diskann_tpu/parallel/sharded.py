"""Database-sharded index over a device mesh.

Design (TPU-native promotion of the reference's sharded build,
`diskann-disk/src/build/builder/core.rs:34-76`):

- The id space is split into ``n_shards`` contiguous ranges of
  ``cap_per_shard``; global id = shard * cap_per_shard + local id.
- Every shard owns a full `GraphArrays` over its range, stacked on a leading
  axis that is sharded over the mesh's ``"shard"`` axis.  All build work is
  local to a device (`shard_map` over the batched 3-phase insert kernel);
  there is no cross-device traffic during construction — the same
  conflict-freedom the reference gets from per-shard in-memory builds.
- Search broadcasts the query batch, runs the local frontier-batched beam
  search per shard, converts results to global ids, then merges the
  per-shard top-k lists with ``jax.lax.all_gather`` over ICI followed by one
  multi-operand sort (replacing the reference's host-side shard merge).
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


@partial(
    jax.jit,
    static_argnames=("mesh", "config", "cap_per_shard", "k", "l_search"),
)
def _sharded_search(
    mesh: Mesh,
    stacked: GraphArrays,
    ns,                       # [n_shards] i32 live counts
    starts,                   # [n_shards, 1] i32 local start ids
    queries,                  # [B, d] replicated
    *,
    config: GraphConfig,
    cap_per_shard: int,
    k: int,
    l_search: int,
):
    def local(st: GraphArrays, n, start, q):
        st = jax.tree.map(lambda a: a[0], st)
        n, start = n[0], start[0]
        res = beam_search(
            st.vectors, st.sq_norms, st.adjacency, start, q,
            metric=config.metric,
            l_search=l_search,
            beam_width=config.beam_width,
            max_hops=config.max_hops,
        )
        shard = jax.lax.axis_index("shard")
        gids = jnp.where(
            res.ids >= 0, res.ids + shard * cap_per_shard, -1
        )
        # gather every shard's top-L and merge to global top-k
        all_d = jax.lax.all_gather(res.dists, "shard")      # [S, B, L]
        all_i = jax.lax.all_gather(gids, "shard")
        s, b, l = all_d.shape
        md = jnp.transpose(all_d, (1, 0, 2)).reshape(b, s * l)
        mi = jnp.transpose(all_i, (1, 0, 2)).reshape(b, s * l)
        md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=1)
        return md[:, :k], mi[:, :k], res.cmps

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P("shard"), P("shard"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(stacked, ns, starts, queries)


@partial(jax.jit, static_argnames=("mesh", "config"))
def _sharded_insert(mesh, stacked, ns, starts, batch, row_valid, config):
    """batch: [n_shards, M, d] — rows routed to shards by the caller."""

    def local(st, n, start, vecs, valid):
        st = jax.tree.map(lambda a: a[0], st)
        n, start = n[0], start[0]
        slots = n + jnp.arange(vecs.shape[1], dtype=jnp.int32)
        st, _packed, stats = insert_batch(
            st, slots, vecs[0], valid[0], start, config,
        )
        new_n = n + valid[0].astype(jnp.int32).sum()
        new_start = graph_state.medoid(st, new_n)[None]
        st = jax.tree.map(lambda a: a[None], st)
        return st, new_n[None], new_start[None], stats.cmps[None]

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, P("shard"), P("shard"), P("shard"), P("shard")),
        out_specs=(spec_state, P("shard"), P("shard"), P("shard")),
        check_vma=False,
    )(stacked, ns, starts, batch, row_valid)


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
    static_argnames=("mesh", "config", "cap_per_shard", "k", "l_search"),
)
def _sharded_search_packed(
    mesh, stacked, packed, ns, starts, queries,
    *, config, cap_per_shard, k, l_search,
):
    """Packed (int8 fat-row) traversal per shard + local full-precision
    rerank, then one all_gather + merge over the mesh — the single-chip
    production search at pod scale."""
    from diskann_tpu.graph.scorers import packed_scorer
    from diskann_tpu.graph.search import beam_search_scored

    def local(st, p, n, start, q):
        st = jax.tree.map(lambda a: a[0], st)
        p = jax.tree.map(lambda a: a[0], p)
        n, start = n[0], start[0]
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
        shard = jax.lax.axis_index("shard")
        gids = jnp.where(ii >= 0, ii + shard * cap_per_shard, -1)
        all_d = jax.lax.all_gather(dd[:, :k], "shard")
        all_i = jax.lax.all_gather(gids[:, :k], "shard")
        s, b, l = all_d.shape
        md = jnp.transpose(all_d, (1, 0, 2)).reshape(b, s * l)
        mi = jnp.transpose(all_i, (1, 0, 2)).reshape(b, s * l)
        md, mi = jax.lax.sort((md, mi), dimension=-1, num_keys=1)
        return md[:, :k], mi[:, :k], res.cmps

    spec_state = jax.tree.map(lambda _: P("shard"), stacked)
    spec_packed = jax.tree.map(lambda _: P("shard"), packed)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_state, spec_packed, P("shard"), P("shard"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(stacked, packed, ns, starts, queries)


class ShardedGraphIndex:
    """A Vamana index partitioned across the devices of a mesh."""

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
        shard_sharding = NamedSharding(mesh, P("shard"))
        self.stacked = jax.device_put(
            _stacked_alloc(
                self.n_shards, cap_per_shard, dim,
                self.config.max_degree_with_slack, dtype,
            ),
            shard_sharding,
        )
        self.ns = jax.device_put(
            jnp.zeros((self.n_shards,), jnp.int32), shard_sharding
        )
        self.starts = jax.device_put(
            jnp.full((self.n_shards, 1), -1, jnp.int32), shard_sharding
        )

    def insert(self, vectors: np.ndarray, assignments: np.ndarray | None = None):
        """Insert vectors, routing each to a shard (round-robin by default;
        pass k-means `assignments` for locality like `partition.rs:23`)."""
        vectors = np.asarray(vectors, np.float32)
        m = vectors.shape[0]
        if assignments is None:
            assignments = np.arange(m) % self.n_shards
        per = [np.nonzero(assignments == s)[0] for s in range(self.n_shards)]
        width = max((len(p) for p in per), default=0)
        if width == 0:
            return
        batch = np.zeros((self.n_shards, width, self.dim), np.float32)
        valid = np.zeros((self.n_shards, width), bool)
        for s, rows in enumerate(per):
            batch[s, : len(rows)] = vectors[rows]
            valid[s, : len(rows)] = True
        self.stacked, self.ns, self.starts, _ = _sharded_insert(
            self.mesh, self.stacked, self.ns, self.starts,
            jnp.asarray(batch), jnp.asarray(valid), self.config,
        )

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

    def search(self, queries, k: int, *, l_search: int | None = None,
               mode: str = "full"):
        queries = jnp.asarray(np.asarray(queries, np.float32))
        l = l_search or max(k, self.config.l_build)
        if mode == "packed":
            if self.packed is None:
                self.attach_packed()
            d, i, cmps = _sharded_search_packed(
                self.mesh, self.stacked, self.packed, self.ns, self.starts,
                queries,
                config=self.config, cap_per_shard=self.cap_per_shard,
                k=k, l_search=l,
            )
        else:
            d, i, cmps = _sharded_search(
                self.mesh, self.stacked, self.ns, self.starts, queries,
                config=self.config, cap_per_shard=self.cap_per_shard,
                k=k, l_search=l,
            )
        return np.asarray(d), np.asarray(i), np.asarray(cmps)


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
