"""Property-based tests (reference uses proptest for numerics crates,
`Cargo.toml:100`)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from diskann_tpu.ops.distance import Metric, pairwise_distance
from diskann_tpu.quant.minmax import MinMaxQuantizer
from diskann_tpu.quant.binary import BinaryQuantizer

_finite = st.floats(-100, 100, allow_nan=False, width=32)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.lists(_finite, min_size=4, max_size=4), min_size=2, max_size=6)
)
def test_l2_metric_axioms(rows):
    x = np.array(rows, np.float32)
    d = np.asarray(pairwise_distance(x, x, Metric.L2))
    assert (d >= 0).all()
    assert np.allclose(d, d.T, atol=1e-2)
    assert np.allclose(np.diag(d), 0, atol=1e-2)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.lists(_finite, min_size=8, max_size=8), min_size=1, max_size=5)
)
def test_minmax_roundtrip_bounded(rows):
    x = np.array(rows, np.float32)
    mm = MinMaxQuantizer()
    codes, lo, step = mm.encode(x)
    rec = np.asarray(mm.decode(codes, lo, step))
    bound = np.asarray(step)[:, None] * 0.51 + 1e-5
    assert (np.abs(rec - x) <= bound).all()


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.lists(_finite, min_size=33, max_size=33), min_size=2, max_size=4)
)
def test_hamming_is_a_metric(rows):
    x = np.array(rows, np.float32)
    bq = BinaryQuantizer(dim=33)
    h = np.asarray(bq.hamming(bq.encode(x), bq.encode(x)))
    assert (h == h.T).all()
    assert (np.diag(h) == 0).all()
    # triangle inequality
    n = len(x)
    for i in range(n):
        for j in range(n):
            for k in range(n):
                assert h[i, j] <= h[i, k] + h[k, j]
