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
from diskann_tpu.ops.kernels.block_patch import (
    PATCH_BLOCK, block_patch, block_patch_ref,
)
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


def test_append_words_matches_byte_scatter():
    # the TPU word-scatter append must produce byte-identical tables to the
    # chunked byte-scatter fallback
    import jax

    from diskann_tpu.graph import packed as pk
    from diskann_tpu.ops.distance import Metric

    rng = np.random.default_rng(31)
    cap, d, dp, rs = 512, 32, 16, 20
    proj, pscale, pbias2 = pk.train_packed(
        rng.standard_normal((256, d)).astype(np.float32), dp, Metric.L2
    )
    p = pk.alloc_packed(proj, pscale, pbias2, cap, rs)
    codes, aux = pk.encode(
        p, jnp.asarray(rng.standard_normal((cap, d)).astype(np.float32)),
        Metric.L2,
    )
    p = pk.set_self_codes(p, jnp.arange(cap, dtype=jnp.int32), codes, aux)

    e = 2048
    pairs = rng.choice(cap * p.r_pack, size=e, replace=False)
    tgt = (pairs // p.r_pack).astype(np.int32)
    slot = (pairs % p.r_pack).astype(np.int32)
    src = rng.integers(0, cap, size=e).astype(np.int32)
    ok = rng.random(e) > 0.1
    tgt_s = jnp.asarray(np.where(ok, tgt, cap).astype(np.int32))
    slot_s = jnp.asarray(np.where(ok, slot, 0).astype(np.int32))
    src_j = jnp.asarray(src)
    aux_g = p.self_aux[jnp.clip(src_j, 0, cap - 1)]
    codes_g = p.self_codes[jnp.clip(src_j, 0, cap - 1)]

    def run_sliced(slice_bytes):
        base, slot_w, id_w, aux_w, code_w = pk._append_prep(
            p.self_codes, p.self_aux, jnp.asarray(tgt), jnp.asarray(slot),
            src_j, jnp.asarray(ok), p.nsec,
        )
        rows = jnp.array(p.rows)  # copy: _append_slice donates its input
        r_sec = rows.shape[0]
        n_slices = max(1, -(-(r_sec * 128) // slice_bytes))
        srows = -(-r_sec // n_slices)
        for s in range(n_slices):
            lo, hi = s * srows, min((s + 1) * srows, r_sec)
            rows = pk._append_slice(
                rows, base, slot_w, id_w, aux_w, code_w,
                lo=lo, hi=hi, id_s=p.id_secs, nsec=p.nsec, dp=p.dp,
            )
        return rows

    rows_w = run_sliced(1 << 40)   # single slice
    # sliced variant (bounded-transient path) must agree byte-for-byte,
    # including negative/OOB word indices being dropped per slice
    rows_s = run_sliced(16384)
    ref = pk.append_edges(
        p, jnp.asarray(tgt), jnp.asarray(slot), src_j, jnp.asarray(ok)
    )  # CPU backend -> byte-scatter fallback
    live = cap * p.nsec  # dump-row write order differs between forms
    np.testing.assert_array_equal(
        np.asarray(rows_w)[:live], np.asarray(ref.rows)[:live]
    )
    np.testing.assert_array_equal(
        np.asarray(rows_s)[:live], np.asarray(ref.rows)[:live]
    )


def test_block_patch_parity_interpret():
    rng = np.random.default_rng(23)
    n_rows = 8 * 4096  # 4096 patchable blocks
    table = rng.integers(-127, 128, size=(n_rows, 128)).astype(np.int8)
    g = PATCH_BLOCK
    # unique destination blocks (duplicate blocks need identical vals)
    idx = rng.choice(n_rows // 8, size=g, replace=False).astype(np.int32)
    vals = rng.integers(-127, 128, size=(g * 8, 128)).astype(np.int8)

    out = block_patch(
        jnp.asarray(table), jnp.asarray(idx), jnp.asarray(vals),
        interpret=True,
    )
    exp = block_patch_ref(jnp.asarray(table), jnp.asarray(idx), jnp.asarray(vals))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(exp))
