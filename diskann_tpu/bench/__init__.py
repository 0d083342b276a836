"""Benchmark harness: recall metrics, percentile stats, JSON job registry."""

from diskann_tpu.bench.recall import knn_recall

__all__ = ["knn_recall"]
