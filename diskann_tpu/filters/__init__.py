"""Label filtering: predicate push-down for filtered ANN search.

Replaces `diskann-label-filter` (query AST + parser, roaring posting lists,
inverted index — `diskann-label-filter/src/lib.rs:6-60`).  TPU re-design:
labels live in a dense per-point bitset ``[N, n_words] uint32`` in HBM (the
device analogue of roaring bitmaps); a query predicate is a tiny AST that
compiles to a chain of gather + bit-test + boolean ops evaluated for whole
candidate batches at once; the search integration is the reference's inline
beta-filter algorithm (`inline_filter_search.rs`): one navigation list over
all nodes with matching distances biased by beta, plus a matched-only result
list."""

from diskann_tpu.filters.labels import LabelSet
from diskann_tpu.filters.predicate import And, Label, Not, Or, parse_predicate
from diskann_tpu.filters.compile import compile_accept

__all__ = [
    "LabelSet",
    "And",
    "Or",
    "Not",
    "Label",
    "parse_predicate",
    "compile_accept",
]
