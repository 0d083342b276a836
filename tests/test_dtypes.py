"""Non-f32 dataset dtypes end-to-end (reference supports f32/f16/i8/u8:
`diskann-vector/src/lib.rs:22` Half, `diskann-garnet/README.md:13-42`).

The TPU design stores vectors at the ingestion dtype (HBM footprint) and
lifts to f32 inside the MXU distance contraction."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
from diskann_tpu.bench.recall import knn_recall


def _build(rng, data, dtype):
    cfg = GraphConfig(max_degree=12, l_build=24)
    return GraphIndex.build(data, cfg, insert_batch_size=256, dtype=dtype)


@pytest.mark.parametrize(
    "dtype,np_dtype,gen",
    [
        (jnp.float16, np.float16,
         lambda rng, n, d: (rng.standard_normal((n, d)) * 2).astype(np.float16)),
        (jnp.int8, np.int8,
         lambda rng, n, d: rng.integers(-100, 100, (n, d)).astype(np.int8)),
        (jnp.uint8, np.uint8,
         lambda rng, n, d: rng.integers(0, 250, (n, d)).astype(np.uint8)),
        (jnp.bfloat16, np.float32,  # bf16 has no numpy dtype; ingest f32
         lambda rng, n, d: (rng.standard_normal((n, d)) * 2).astype(np.float32)),
    ],
    ids=["f16", "i8", "u8", "bf16"],
)
def test_dtype_build_search_recall(rng, dtype, np_dtype, gen):
    n, d = 900, 16
    x = gen(rng, n, d)
    idx = _build(rng, x, dtype)
    assert idx.state.vectors.dtype == dtype
    q = x[:40].astype(np.float32) + 0.01
    gt_d, gt_i = FlatIndex(x.astype(np.float32), Metric.L2).search(q, k=10)
    _, ids, _ = idx.search(q, k=10, l_search=32)
    assert knn_recall(ids, gt_i, 10) >= 0.9


def test_i8_delete_and_insert_cycle(rng):
    x = rng.integers(-100, 100, (700, 12)).astype(np.int8)
    idx = _build(rng, x, jnp.int8)
    dead = rng.choice(700, size=100, replace=False)
    idx.delete(dead)
    more = rng.integers(-100, 100, (50, 12)).astype(np.int8)
    slots = idx.insert(more)  # the freelist recycles deleted slots
    assert idx.state.vectors.dtype == jnp.int8
    still_dead = np.setdiff1d(dead, slots)
    _, ids, _ = idx.search(x[:10].astype(np.float32), k=5, l_search=24)
    assert not np.isin(ids[ids >= 0], still_dead).any()


def test_f16_save_load_preserves_dtype(tmp_path, rng):
    x = (rng.standard_normal((600, 12)) * 2).astype(np.float16)
    idx = _build(rng, x, jnp.float16)
    q = x[:16].astype(np.float32)
    want_d, want_i, _ = idx.search(q, k=5, l_search=24)
    p = str(tmp_path / "f16idx")
    idx.save(p)
    re = GraphIndex.load(p)
    assert re.state.vectors.dtype == jnp.float16
    got_d, got_i, _ = re.search(q, k=5, l_search=24)
    np.testing.assert_array_equal(got_i, want_i)


def test_u8_fbin_roundtrip(tmp_path, rng):
    from diskann_tpu.io_.fbin import read_fbin, write_fbin

    x = rng.integers(0, 255, (64, 8)).astype(np.uint8)
    p = str(tmp_path / "u8.fbin")
    write_fbin(p, x)
    back = read_fbin(p, dtype=np.uint8)
    np.testing.assert_array_equal(back, x)


def test_i8pack_query_wire(rng):
    """int8 query wire (per-row SQ + in-band f32 scale): the encoder/decoder
    round-trip is exact up to the quantization step, and search through the
    wire holds recall (the upload is on the search critical path — f32 wire
    measured -35% QPS on the relay, so the i8 wire is the production
    bandwidth lever; /tmp/r5_battery3.log)."""
    import jax.numpy as jnp

    from diskann_tpu import FlatIndex, GraphConfig, GraphIndex, Metric
    from diskann_tpu.bench.recall import knn_recall
    from diskann_tpu.graph.index import _decode_i8pack, _encode_i8pack

    q = (rng.standard_normal((64, 24)) * 3).astype(np.float32)
    wire = _encode_i8pack(q)
    assert wire.dtype == np.int8 and wire.shape == (64, 28)
    back = np.asarray(_decode_i8pack(jnp.asarray(wire), 24))
    step = np.abs(q).max(axis=1, keepdims=True) / 127.0
    assert (np.abs(back - q) <= step * 0.5 + 1e-7).all()

    n, d = 1500, 24
    centers = rng.standard_normal((20, d)).astype(np.float32) * 2
    a = rng.integers(0, 20, size=n)
    x = centers[a] + 0.2 * rng.standard_normal((n, d)).astype(np.float32)
    qs = centers[rng.integers(0, 20, size=64)] + 0.2 * rng.standard_normal(
        (64, d)
    ).astype(np.float32)
    idx = GraphIndex.build(x, GraphConfig(max_degree=16, l_build=32),
                           insert_batch_size=512, build_mode="packed",
                           packed_dp=24, search_batch_size=64)
    gt = FlatIndex(x, Metric.L2).search(qs, k=10)[1]
    _, i_f32, _ = idx.search(qs, k=10, l_search=40, mode="packed")
    _, i_i8, _ = idx.search(qs, k=10, l_search=40, mode="packed",
                            query_dtype="i8")
    r32, r8 = knn_recall(i_f32, gt, 10), knn_recall(i_i8, gt, 10)
    assert r8 >= r32 - 0.03, (r32, r8)
