"""Interpret-mode parity tests for the Pallas TPU kernels.

These run the kernels under the Pallas interpreter on CPU against their
pure-XLA oracles.  The interpreter executes DMAs synchronously at
``start()``, which makes buffer-reuse races deterministic failures (a
refill DMA issued before its slot is consumed clobbers the data) — the
class of bug these tests exist to catch.
"""

import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph import packed as pk
from diskann_tpu.ops.distance import Metric
from diskann_tpu.ops.kernels.block_patch import (
    PATCH_BLOCK, block_patch, block_patch_ref,
)
from diskann_tpu.ops.kernels.fatrow_expand import (
    fatrow_expand, fatrow_expand_ref,
)

RP, DP = 16, 64  # idw=1, code word-rows=2, nwr=8


def _rand_word_rows(rng, n, rp, dp):
    nwr = pk.n_wrows(rp, dp)
    return jnp.asarray(
        rng.integers(-(2**31), 2**31, size=(n * nwr, 128), dtype=np.int64)
        .astype(np.int32)
    )


def _expand_case(rng, n, bw, rp, dp):
    rows = _rand_word_rows(rng, n, rp, dp)
    beam = jnp.asarray(rng.integers(0, n, size=(bw,)).astype(np.int32))
    qiw = jnp.asarray(rng.integers(-127, 128, size=(bw, dp)).astype(np.int8))
    got = fatrow_expand(rows, beam, qiw, rp=rp, dp=dp, interpret=True)
    want = fatrow_expand_ref(rows, beam, qiw, rp=rp, dp=dp)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_fatrow_expand_parity_interpret():
    _expand_case(np.random.default_rng(7), 1024, 512, RP, DP)


def test_fatrow_expand_parity_multiblock():
    # two grid programs; repeated beam ids across blocks
    _expand_case(np.random.default_rng(11), 512, 1024, RP, DP)


def test_fatrow_expand_small_dp():
    # dp=32 -> dpw=8, 16 codes per word-row: exercises the lane-block
    # interleave and byte-plane unpack at a different geometry
    _expand_case(np.random.default_rng(17), 256, 512, 32, 32)


def test_append_words_matches_refresh():
    # appending one edge per (target, slot) must leave exactly the bytes a
    # full refresh of the same adjacency writes (ids, aux and codes)
    rng = np.random.default_rng(31)
    cap, d, dp, rs = 256, 32, 16, 20
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((256, d)).astype(np.float32), dp, Metric.L2
    )
    p = pk.alloc_packed(proj, pscale, pbias2, cap, rs)
    codes, aux = pk.encode(
        p, jnp.asarray(rng.standard_normal((cap, d)).astype(np.float32)),
        Metric.L2,
    )
    p = pk.set_self_codes(p, jnp.arange(cap, dtype=jnp.int32), codes, aux)
    # zero node 0's codes: refresh writes clip(-1 -> 0)'s codes into EMPTY
    # slots (masked by aux=inf) while append leaves the alloc-time zeros —
    # make both paths byte-identical for the comparison below
    p = p._replace(self_codes=p.self_codes.at[0].set(0))

    # adjacency with exactly one neighbor per (row, slot) pair to append
    adj = np.full((cap, rs), -1, np.int32)
    e = 2048
    pairs = rng.choice(cap * rs, size=e, replace=False)
    tgt = (pairs // rs).astype(np.int32)
    slot = (pairs % rs).astype(np.int32)
    src = rng.integers(0, cap, size=e).astype(np.int32)
    ok = rng.random(e) > 0.1
    adj[tgt[ok], slot[ok]] = src[ok]

    via_append = pk.append_edges(
        p, jnp.asarray(tgt), jnp.asarray(slot), jnp.asarray(src),
        jnp.asarray(ok),
    )
    via_refresh = pk.refresh_rows(
        p, jnp.asarray(adj), jnp.arange(cap, dtype=jnp.int32)
    )
    live = cap * p.nwr
    np.testing.assert_array_equal(
        np.asarray(via_append.rows)[:live],
        np.asarray(via_refresh.rows)[:live],
    )


def test_block_patch_parity_interpret():
    rng = np.random.default_rng(23)
    n_rows = 8 * 4096  # 4096 patchable blocks
    for dt in (np.int8, np.int32):
        table = rng.integers(-100, 100, size=(n_rows, 128)).astype(dt)
        g = PATCH_BLOCK
        # unique destination blocks (duplicate blocks need identical vals)
        idx = rng.choice(n_rows // 8, size=g, replace=False).astype(np.int32)
        vals = rng.integers(-100, 100, size=(g * 8, 128)).astype(dt)

        out = block_patch(
            jnp.asarray(table), jnp.asarray(idx), jnp.asarray(vals),
            interpret=True,
        )
        exp = block_patch_ref(
            jnp.asarray(table), jnp.asarray(idx), jnp.asarray(vals)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(exp))
