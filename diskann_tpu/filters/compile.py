"""Compile a predicate AST to a jit-static accept function.

The returned callable has signature ``fn(bits, ids, valid) -> bool mask``
where ``bits`` is the device bitset (a traced argument, so it is never baked
into the compiled program) and the label->bit resolution happened at compile
time.  Functions are cached so repeated searches with the same predicate and
vocabulary reuse one jit specialization (replaces the reference's
`query_evaluator_impl` over posting lists)."""

from __future__ import annotations

import jax.numpy as jnp

from diskann_tpu.filters.predicate import And, Label, Not, Or, Predicate

_CACHE: dict = {}


def _build(pred: Predicate, vocab: dict[str, int]):
    if isinstance(pred, Label):
        if pred.name not in vocab:
            raise KeyError(f"unknown label {pred.name!r}")
        word, bit = divmod(vocab[pred.name], 32)

        def f(bits, safe_ids):
            return ((bits[safe_ids, word] >> jnp.uint32(bit)) & 1).astype(jnp.bool_)

        return f
    if isinstance(pred, And):
        fl, fr = _build(pred.left, vocab), _build(pred.right, vocab)
        return lambda bits, ids: fl(bits, ids) & fr(bits, ids)
    if isinstance(pred, Or):
        fl, fr = _build(pred.left, vocab), _build(pred.right, vocab)
        return lambda bits, ids: fl(bits, ids) | fr(bits, ids)
    if isinstance(pred, Not):
        fi = _build(pred.inner, vocab)
        return lambda bits, ids: ~fi(bits, ids)
    raise TypeError(f"not a predicate: {pred!r}")


def compile_accept(pred: Predicate, vocab: dict[str, int], capacity: int):
    key = (pred, tuple(sorted(vocab.items())), capacity)
    if key in _CACHE:
        return _CACHE[key]
    inner = _build(pred, vocab)

    def accept_fn(bits, ids, valid):
        safe = jnp.clip(ids, 0, capacity - 1)
        return inner(bits, safe) & valid & (ids >= 0)

    _CACHE[key] = accept_fn
    return accept_fn
