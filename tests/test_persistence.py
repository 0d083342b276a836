"""Full persistence round-trips: every attachment survives save/load and a
reloaded index returns IDENTICAL search results in every mode — including in
a fresh process (reference provider storage:
`diskann-providers/src/storage/{index_storage,pq_storage,sq_storage}.rs`)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from diskann_tpu import GraphConfig, GraphIndex, Metric
from diskann_tpu.tiered import TieredIndex


def _mkdata(rng, n=900, d=32):
    centers = rng.standard_normal((16, d)).astype(np.float32) * 2
    a = rng.integers(0, 16, size=n)
    x = centers[a] + 0.25 * rng.standard_normal((n, d)).astype(np.float32)
    q = centers[rng.integers(0, 16, size=24)] + 0.25 * rng.standard_normal(
        (24, d)
    ).astype(np.float32)
    return x, q


@pytest.fixture(scope="module")
def saved(tmp_path_factory):
    rng = np.random.default_rng(7)
    x, q = _mkdata(rng)
    idx = GraphIndex.build(
        x, GraphConfig(max_degree=16, l_build=32), insert_batch_size=512
    )
    idx.attach_packed(dp=16)
    idx.attach_pq(n_chunks=8)
    idx.attach_sq()
    idx.attach_spherical(n_bits=4)
    labels = [["even" if i % 2 == 0 else "odd", f"g{i % 5}"]
              for i in range(len(x))]
    idx.attach_labels(labels)
    idx.delete(np.array([3, 100, 555]))
    path = str(tmp_path_factory.mktemp("persist") / "idx")
    idx.save(path)
    return idx, path, q


MODES = ["full", "packed", "pq", "sq", "spherical"]


def _all_results(idx, q):
    out = {}
    for mode in MODES:
        d, i, _ = idx.search(q, k=10, l_search=40, mode=mode)
        out[mode] = (d, i)
    fd, fi, _ = idx.search_filtered(q, "even", k=5, l_search=40)
    out["filtered"] = (fd, fi)
    return out


def test_roundtrip_identical_all_modes(saved):
    idx, path, q = saved
    want = _all_results(idx, q)
    got = _all_results(GraphIndex.load(path), q)
    for mode in want:
        np.testing.assert_array_equal(
            got[mode][1], want[mode][1], err_msg=f"ids differ in {mode}"
        )
        np.testing.assert_allclose(
            got[mode][0], want[mode][0], rtol=1e-5, err_msg=mode
        )


def test_roundtrip_state_fields(saved):
    idx, path, _ = saved
    re = GraphIndex.load(path)
    assert re.n == idx.n and re.n_deleted == idx.n_deleted
    assert sorted(re.free_slots) == sorted(idx.free_slots)
    assert re.labels.vocab == idx.labels.vocab
    assert re.packed.r_pack == idx.packed.r_pack
    np.testing.assert_array_equal(
        np.asarray(re.packed.rows[: idx.n * idx.packed.nwr]),
        np.asarray(idx.packed.rows[: idx.n * idx.packed.nwr]),
    )
    np.testing.assert_array_equal(
        np.asarray(re.state.adjacency[: re.n]),
        np.asarray(idx.state.adjacency[: idx.n]),
    )


def test_fresh_process_reload(saved, tmp_path):
    idx, path, q = saved
    d, i, _ = idx.search(q, k=10, l_search=40, mode="packed")
    qf, rf = str(tmp_path / "q.npy"), str(tmp_path / "r.npz")
    np.save(qf, q)
    code = (
        "import numpy as np\n"
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "from diskann_tpu import GraphIndex\n"
        f"idx = GraphIndex.load({path!r})\n"
        f"q = np.load({qf!r})\n"
        "d, i, _ = idx.search(q, k=10, l_search=40, mode='packed')\n"
        f"np.savez({rf!r}, d=d, i=i)\n"
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:/root/.axon_site"
    subprocess.run(
        [sys.executable, "-c", code], check=True, env=env, timeout=600
    )
    got = np.load(rf)
    np.testing.assert_array_equal(got["i"], i)
    np.testing.assert_allclose(got["d"], d, rtol=1e-5)


def test_reloaded_index_supports_updates(saved, rng):
    _, path, q = saved
    re = GraphIndex.load(path)
    n0 = re.n_live
    new = rng.standard_normal((40, re.dim)).astype(np.float32)
    re.insert(new)
    assert re.n_live == n0 + 40
    _, ids, _ = re.search(q, k=5, l_search=40)
    assert (ids[:, 0] >= 0).all()


def test_tiered_roundtrip(tmp_path, rng):
    x, q = _mkdata(rng, n=700, d=16)
    t = TieredIndex.build_from_host(
        x, GraphConfig(max_degree=12, l_build=24), dp=16,
        insert_batch_size=256,
    )
    t.io_limit = 16
    want_d, want_i, _ = t.search(q, k=5, l_search=24)
    p = str(tmp_path / "tiered")
    t.save(p)
    re = TieredIndex.load(p)
    assert re.io_limit == 16
    assert re.graph.state.vectors.shape[0] == 1  # still HBM-dropped
    got_d, got_i, _ = re.search(q, k=5, l_search=24)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-5)
