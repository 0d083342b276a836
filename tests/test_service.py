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
