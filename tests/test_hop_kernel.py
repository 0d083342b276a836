"""Fused hop-update kernel vs the unfused XLA path (exact equivalence)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from diskann_tpu.graph.search import beam_search
from diskann_tpu.ops.distance import Metric, squared_norms
from diskann_tpu.ops.kernels.hop_update import (
    hop_update, hop_update_ref, prepare_candidates,
)

from test_search import random_graph


def make_state(rng, b, l, c, nmax=10_000):
    bd = np.sort(rng.standard_normal((b, l)).astype(np.float32) ** 2, axis=1)
    bi = np.zeros((b, l), np.int32)
    for row in range(b):  # unique ids per row
        bi[row] = rng.choice(nmax, size=l, replace=False)
    be = (rng.random((b, l)) < 0.5).astype(np.int32)
    cand = rng.choice(nmax, size=(b, c)).astype(np.int32)
    # sprinkle sentinels and ids already in the list
    cand[rng.random((b, c)) < 0.1] = 2**31 - 1
    cand[:, 0] = bi[:, 0]          # guaranteed in-list dup
    cand[:, 1] = cand[:, 2]        # guaranteed intra dup
    cd = np.abs(rng.standard_normal((b, c))).astype(np.float32)
    pc, pd = prepare_candidates(
        jnp.asarray(bi), jnp.asarray(cand), jnp.asarray(cd)
    )
    return (jnp.asarray(bd), jnp.asarray(bi), jnp.asarray(be), pc, pd)


def test_ref_matches_manual_merge(rng):
    b, l, c, w = 4, 16, 12, 2
    bd, bi, be, cand, cd = make_state(rng, b, l, c)
    out = hop_update_ref(bd, bi, be, cand, cd, w)
    BIG = 1.0e38
    for row in range(b):
        # manual: stable merge of prepared candidates, truncate to L
        ents = [(float(d), int(i), int(e)) for d, i, e in
                zip(np.asarray(bd)[row], np.asarray(bi)[row], np.asarray(be)[row])
                if i >= 0]
        for j in range(c):
            cid = int(np.asarray(cand)[row, j])
            dj = float(np.asarray(cd)[row, j])
            if cid == 2**31 - 1 or cid < 0 or dj >= BIG:
                continue
            ents.append((dj, cid, 0))
        ents = sorted(ents, key=lambda t: t[0])[:l]
        got_i = np.asarray(out.best_i)[row]
        want_i = [i for _, i, _ in ents] + [-1] * (l - len(ents))
        assert got_i.tolist() == want_i, row
        # frontier = first w unexpanded, now marked expanded
        unexp = [i for d, i, e in ents if e == 0]
        want_beam = (unexp[:w] + [-1] * w)[:w]
        assert np.asarray(out.beam_i)[row].tolist() == want_beam


def test_pallas_interpret_matches_ref(rng):
    b, l, c, w = 64, 32, 24, 4
    args = make_state(rng, b, l, c)
    ref = hop_update_ref(*args, w)
    pal = hop_update(*args, w=w, block=32, interpret=True)
    for a, b_ in zip(ref, pal):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fused_loop_matches_unfused(rng):
    n, d, r, l = 400, 8, 6, 12
    vectors = rng.standard_normal((n, d)).astype(np.float32)
    adj = random_graph(rng, n, r)
    queries = rng.standard_normal((8, d)).astype(np.float32)
    v = jnp.asarray(vectors)
    kw = dict(metric=Metric.L2, l_search=l, beam_width=2, dedup="list")
    a = beam_search(v, squared_norms(v), jnp.asarray(adj),
                    jnp.asarray([0], jnp.int32), jnp.asarray(queries),
                    fused=True, **kw)
    b = beam_search(v, squared_norms(v), jnp.asarray(adj),
                    jnp.asarray([0], jnp.int32), jnp.asarray(queries),
                    fused=False, **kw)
    np.testing.assert_array_equal(np.asarray(a.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(a.dists), np.asarray(b.dists),
                               rtol=1e-6)
