"""Vector-set service facade (VADD/VSIM surface)."""

import numpy as np
import pytest

from diskann_tpu.service import VectorService


def test_vector_set_lifecycle(rng):
    svc = VectorService()
    vs = svc.create_index("products", 16, max_degree=8, l_build=16,
                          insert_batch_size=64)
    assert svc.names() == ["products"]

    vecs = {f"item{i}": rng.standard_normal(16).astype(np.float32)
            for i in range(50)}
    for name, v in vecs.items():
        assert vs.add(name, v, attribute={"i": name})
    assert not vs.add("item0", vecs["item0"])  # duplicate rejected
    assert vs.card() == 50

    res = vs.search_vector(vecs["item7"] + 0.001, k=5, l_search=16)
    assert res[0][0] == "item7"

    res2 = vs.search_element("item7", k=5, l_search=16)
    assert all(n != "item7" for n, _ in res2)
    assert len(res2) == 5

    assert vs.get_attribute("item7") == {"i": "item7"}
    assert vs.set_attribute("item7", {"x": 1})
    assert vs.get_attribute("item7") == {"x": 1}

    assert vs.remove("item7")
    assert vs.card() == 49
    res3 = vs.search_vector(vecs["item7"], k=5, l_search=16)
    assert all(n != "item7" for n, _ in res3)

    assert svc.drop_index("products")
    assert not svc.drop_index("products")


def test_service_continue_search(rng):
    svc = VectorService()
    vs = svc.create_index("pg", 12, max_degree=8, l_build=16,
                          insert_batch_size=64)
    names = [f"e{i}" for i in range(120)]
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    assert vs.add_batch(names, vecs) == 120
    q = vecs[5] + 0.001
    cursor, page1 = vs.start_search(q, page_size=6, l_search=16)
    assert page1[0][0] == "e5" and len(page1) == 6
    page2 = vs.continue_search(cursor, 6)
    assert len(page2) == 6
    # pages are disjoint (`continue_search` contract, lib.rs:752)
    assert not {n for n, _ in page1} & {n for n, _ in page2}
    assert vs.end_search(cursor)
    assert vs.continue_search(cursor, 6) == []  # freed


def test_service_quant_backfill(rng):
    """full -> quantized transition (`diskann-garnet/src/quantization.rs`):
    train on current elements, backfill, then adds encode incrementally and
    searches run quantized by default."""
    svc = VectorService()
    vs = svc.create_index("qz", 16, max_degree=8, l_build=16,
                          insert_batch_size=64)
    names = [f"a{i}" for i in range(150)]
    vecs = rng.standard_normal((150, 16)).astype(np.float32)
    vs.add_batch(names, vecs)
    vs.build_quant_table("sq")
    assert vs.backfill_quant_vectors() == 150
    # streaming adds after the table exists are encoded incrementally
    more = rng.standard_normal((30, 16)).astype(np.float32)
    vs.add_batch([f"b{i}" for i in range(30)], more)
    hit = vs.search_vector(more[3] + 0.0005, k=3, l_search=24)
    assert hit[0][0] == "b3"
    # explicit full-precision search still available
    hit_full = vs.search_vector(more[3] + 0.0005, k=3, l_search=24,
                                mode="full")
    assert hit_full[0][0] == "b3"


def test_service_minmax_streaming(rng):
    svc = VectorService()
    vs = svc.create_index("mm", 12, max_degree=8, l_build=16,
                          insert_batch_size=64)
    vecs = rng.standard_normal((100, 12)).astype(np.float32)
    vs.add_batch([f"x{i}" for i in range(100)], vecs)
    vs.build_quant_table("minmax")
    vs.add("fresh", vecs[0] * 0.5 + 0.1)
    got = vs.search_vector(vecs[0] * 0.5 + 0.1, k=1, l_search=20)
    assert got[0][0] == "fresh"


def test_service_filtered_vsim(rng):
    """VSIM ... FILTER analogue (`filtered_search_vector`, lib.rs:623):
    string(-list) attributes act as labels; predicates filter results;
    attribute updates and removals invalidate the label cache."""
    svc = VectorService()
    vs = svc.create_index("f", 12, max_degree=8, l_build=16,
                          insert_batch_size=64)
    vecs = rng.standard_normal((120, 12)).astype(np.float32)
    attrs = [["red"] if i % 3 == 0 else ["blue", "big"] for i in range(120)]
    vs.add_batch([f"e{i}" for i in range(120)], vecs, attrs)
    q = vecs[9] + 0.001  # e9 is red
    got = vs.search_vector_filtered(q, "red", k=5, l_search=24)
    assert got and got[0][0] == "e9"
    assert all(int(n[1:]) % 3 == 0 for n, _ in got)
    got_b = vs.search_vector_filtered(q, "blue & big", k=5, l_search=24)
    assert got_b and all(int(n[1:]) % 3 != 0 for n, _ in got_b)
    # attribute update moves an element across the predicate boundary
    vs.set_attribute("e9", ["blue", "big"])
    got2 = vs.search_vector_filtered(q, "red", k=5, l_search=24)
    assert all(n != "e9" for n, _ in got2)
    # removal invalidates too
    vs.remove("e0")
    got3 = vs.search_vector_filtered(vecs[0] + 0.001, "red", k=5,
                                     l_search=24)
    assert all(n != "e0" for n, _ in got3)
