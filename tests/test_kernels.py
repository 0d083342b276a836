"""Interpret-mode parity tests for the Pallas TPU kernels.

These run the kernels under the Pallas interpreter on CPU against their
pure-XLA oracles.  The interpreter executes DMAs synchronously at
``start()``, which makes buffer-reuse races deterministic failures (a
refill DMA issued before its slot is consumed clobbers the data) — the
class of bug these tests exist to catch.
"""

import jax.numpy as jnp
import numpy as np

from diskann_tpu.graph.packed import id_sectors, n_sectors
from diskann_tpu.ops.kernels.fatrow_append import EDGE_BLOCK, fatrow_append
from diskann_tpu.ops.kernels.fatrow_expand import (
    fatrow_expand, fatrow_expand_ref,
)

RP, DP = 16, 64  # id_secs=1, code sectors=8, nsec=16 (rounded to 8-multiple)


def _rand_sector_rows(rng, n, rp, dp):
    nsec = n_sectors(rp, dp)
    return jnp.asarray(
        rng.integers(-127, 128, size=(n * nsec, 128)).astype(np.int8)
    )


def test_fatrow_expand_parity_interpret():
    rng = np.random.default_rng(7)
    n, bw = 1024, 512
    rows = _rand_sector_rows(rng, n, RP, DP)
    beam = jnp.asarray(rng.integers(0, n, size=(bw,)).astype(np.int32))
    qiw = jnp.asarray(rng.integers(-127, 128, size=(bw, DP)).astype(np.int8))

    hdr_k, dots_k = fatrow_expand(
        rows, beam, qiw, rp=RP, dp=DP, interpret=True
    )
    hdr_r, dots_r = fatrow_expand_ref(rows, beam, qiw, rp=RP, dp=DP)
    np.testing.assert_array_equal(np.asarray(hdr_k), np.asarray(hdr_r))
    np.testing.assert_array_equal(np.asarray(dots_k), np.asarray(dots_r))


def test_fatrow_expand_parity_multiblock():
    # two grid programs; beam ids deliberately repeat across blocks
    rng = np.random.default_rng(11)
    n, bw = 512, 1024
    rows = _rand_sector_rows(rng, n, RP, DP)
    beam = jnp.asarray(
        np.concatenate([
            rng.integers(0, n, size=(bw // 2,)),
            rng.integers(0, n, size=(bw // 2,)),
        ]).astype(np.int32)
    )
    qiw = jnp.asarray(rng.integers(-127, 128, size=(bw, DP)).astype(np.int8))
    hdr_k, dots_k = fatrow_expand(
        rows, beam, qiw, rp=RP, dp=DP, interpret=True
    )
    hdr_r, dots_r = fatrow_expand_ref(rows, beam, qiw, rp=RP, dp=DP)
    np.testing.assert_array_equal(np.asarray(hdr_k), np.asarray(hdr_r))
    np.testing.assert_array_equal(np.asarray(dots_k), np.asarray(dots_r))


def test_fatrow_expand_small_dp():
    # dp=32 -> 4 codes per sector exercises the lane-block interleave
    rp, dp = 32, 32  # id_secs=1, code sectors=8, nsec=16
    rng = np.random.default_rng(17)
    n, bw = 256, 512
    rows = _rand_sector_rows(rng, n, rp, dp)
    beam = jnp.asarray(rng.integers(0, n, size=(bw,)).astype(np.int32))
    qiw = jnp.asarray(rng.integers(-127, 128, size=(bw, dp)).astype(np.int8))
    hdr_k, dots_k = fatrow_expand(
        rows, beam, qiw, rp=rp, dp=dp, interpret=True
    )
    hdr_r, dots_r = fatrow_expand_ref(rows, beam, qiw, rp=rp, dp=dp)
    np.testing.assert_array_equal(np.asarray(hdr_k), np.asarray(hdr_r))
    np.testing.assert_array_equal(np.asarray(dots_k), np.asarray(dots_r))


def test_fatrow_append_parity_interpret():
    rng = np.random.default_rng(13)
    cap = 256
    id_s = id_sectors(RP)
    nsec = n_sectors(RP, DP)
    rows = np.asarray(
        rng.integers(-127, 128, size=((cap + 1) * nsec, 128)).astype(np.int8)
    )
    e = EDGE_BLOCK
    # unique (tgt, slot) pairs so application order can't matter
    pairs = rng.choice(cap * RP, size=e, replace=False)
    tgt = (pairs // RP).astype(np.int32)
    slot = (pairs % RP).astype(np.int32)
    # a few dropped edges -> the sacrificial dump row
    drop = rng.random(e) < 0.1
    tgt[drop] = cap
    slot[drop] = 0
    recs = rng.integers(-127, 128, size=(e, 128)).astype(np.int8)

    out = fatrow_append(
        jnp.asarray(rows), jnp.asarray(tgt), jnp.asarray(slot),
        jnp.asarray(recs), rp=RP, dp=DP, interpret=True,
    )

    exp = rows.reshape(cap + 1, nsec * 128).copy()
    cpl = 128 // DP
    for i in range(e):
        t, s = int(tgt[i]), int(slot[i])
        ib = (s // 32) * 128 + (s % 32) * 4
        ab = (id_s + s // 32) * 128 + (s % 32) * 4
        cb = (2 * id_s + s // cpl) * 128 + (s % cpl) * DP
        exp[t, ib : ib + 4] = recs[i, 0:4]
        exp[t, ab : ab + 4] = recs[i, 4:8]
        exp[t, cb : cb + DP] = recs[i, 8 : 8 + DP]
    got = np.asarray(out).reshape(cap + 1, nsec * 128)
    # dump row contents are unspecified
    np.testing.assert_array_equal(got[:cap], exp[:cap])
