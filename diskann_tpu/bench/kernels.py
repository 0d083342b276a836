"""Device-kernel microbenchmarks (replaces `diskann-benchmark-simd`).

The reference microbenchmarks its SIMD distance kernels with regression
detection (`diskann-benchmark-simd/src/lib.rs`).  The TPU analogue times
the dense device kernels the framework is built from:

- ``pairwise``: [M, d] x [N, d] distance matrix (the flat-scan / k-means /
  prune core) — reports GFLOP/s so MXU utilization is visible.
- ``expand_score``: packed-row gather + int8 candidate scoring (the beam
  search hop core) — reports ms/op and effective gather GB/s.
- ``sort_merge``: the [B, L+C] multi-operand merge sort of the search loop.
- ``lut_score``: PQ ADC table-gather scoring.

Methodology (CLAUDE.md): iterations are CHAINED inside one jitted
`lax.fori_loop` (each iteration's input depends on the previous output) and
timed with a single tiny host fetch, so per-dispatch relay latency doesn't
pollute the numbers.  Regression gating reuses the registry's
`check_tolerances` A/B machinery like every other benchmark family.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from diskann_tpu.ops.distance import Metric, pairwise_distance


def _timed(build_fn, iters: int) -> float:
    """build_fn() -> (jitted chained fn, args). Returns seconds per op."""
    fn, args = build_fn(iters)
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]  # warmup + materialize
    t0 = time.time()
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.time() - t0) / iters


def bench_pairwise(m: int, n: int, d: int, metric: Metric, dtype, iters: int):
    key = jax.random.key(0)
    x = jax.random.normal(key, (m, d), jnp.float32).astype(dtype)
    y = jax.random.normal(jax.random.fold_in(key, 1), (n, d), jnp.float32).astype(dtype)

    def build(iters):
        def chained(x, y):
            def body(i, carry):
                xq = carry
                dmat = pairwise_distance(xq.astype(jnp.float32), y.astype(jnp.float32), metric)
                # fold a scalar of the output back in to chain the iterations
                return xq + (dmat[0, 0] * 1e-30).astype(xq.dtype)
            return jax.lax.fori_loop(0, iters, body, x)
        return jax.jit(partial(chained)), (x, y)

    s = _timed(build, iters)
    flops = 2.0 * m * n * d
    return {"ms_per_op": s * 1e3, "gflops": flops / s / 1e9}


def bench_expand_score(b: int, r: int, dp: int, n_rows: int, iters: int):
    key = jax.random.key(0)
    gen = jax.jit(lambda k: jax.random.randint(
        k, (n_rows // 4, r * dp), -127, 128, dtype=jnp.int8))
    codes = jnp.concatenate(
        [gen(jax.random.fold_in(key, i)) for i in range(4)], axis=0
    )
    aux = jax.random.uniform(key, (n_rows, r), jnp.float32, 0.0, 100.0)
    qi = jax.random.randint(key, (b, dp), -127, 128, dtype=jnp.int8)
    beam = jax.random.randint(key, (b,), 0, n_rows, dtype=jnp.int32)

    def build(iters):
        def chained(codes, aux, qi, beam):
            def body(i, carry):
                beam, acc = carry
                rows = codes[beam].reshape(b, r, dp)
                dots = jax.lax.dot_general(
                    qi, rows, (((1,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                d = aux[beam] - 2.0 * dots
                nxt = (beam + jnp.argmin(d, axis=1).astype(jnp.int32)) % n_rows
                return nxt, acc + d[:, 0] * 1e-30
            _, acc = jax.lax.fori_loop(
                0, iters, body, (beam, jnp.zeros((b,), jnp.float32))
            )
            return acc
        return jax.jit(chained), (codes, aux, qi, beam)

    s = _timed(build, iters)
    gb = b * r * dp / 1e9
    return {"ms_per_op": s * 1e3, "gather_gbps": gb / s}


def bench_sort_merge(b: int, l: int, c: int, iters: int):
    key = jax.random.key(0)
    d0 = jax.random.uniform(key, (b, l + c), jnp.float32)
    i0 = jax.random.randint(key, (b, l + c), 0, 1 << 20, dtype=jnp.int32)

    def build(iters):
        def chained(d0, i0):
            def body(i, carry):
                d, ids = carry
                sd, si, _ = jax.lax.sort(
                    (d, ids, jnp.zeros_like(ids)), dimension=-1, num_keys=1
                )
                return jnp.roll(sd, 1, axis=1), si
            return jax.lax.fori_loop(0, iters, body, (d0, i0))
        return jax.jit(chained), (d0, i0)

    s = _timed(build, iters)
    return {"ms_per_op": s * 1e3}


def bench_lut_score(b: int, c: int, m: int, k: int, n_rows: int, iters: int):
    key = jax.random.key(0)
    codes = jax.random.randint(key, (n_rows, m), 0, k, dtype=jnp.uint8)
    lut = jax.random.uniform(key, (b, m * k), jnp.float32)
    ids = jax.random.randint(key, (b, c), 0, n_rows, dtype=jnp.int32)

    def build(iters):
        def chained(codes, lut, ids):
            def body(i, carry):
                ids, acc = carry
                cc = codes[ids].astype(jnp.int32)            # [B, C, m]
                flat = cc + jnp.arange(m, dtype=jnp.int32)[None, None, :] * k
                d = jnp.take_along_axis(
                    lut[:, None, :], flat.reshape(b, c * m)[:, None, :], axis=2
                ).reshape(b, c, m).sum(axis=-1)
                nxt = (ids + jnp.argmin(d, axis=1)[:, None]) % n_rows
                return nxt, acc + d[:, 0] * 1e-30
            _, acc = jax.lax.fori_loop(
                0, iters, body, (ids, jnp.zeros((b,), jnp.float32))
            )
            return acc
        return jax.jit(chained), (codes, lut, ids)

    s = _timed(build, iters)
    return {"ms_per_op": s * 1e3}


def kernels_job(job: dict) -> dict:
    """Registry entry point: {"benchmark": "kernels", "op": ..., ...}."""
    op = job.get("op", "pairwise")
    iters = job.get("iters", 16)
    if op == "pairwise":
        dtype = {"f32": jnp.float32, "bf16": jnp.bfloat16}[job.get("dtype", "f32")]
        return bench_pairwise(
            job.get("m", 1024), job.get("n", 4096), job.get("dim", 128),
            Metric(job.get("metric", "l2")), dtype, iters,
        )
    if op == "expand_score":
        return bench_expand_score(
            job.get("b", 1024), job.get("r", 64), job.get("dp", 64),
            job.get("n_rows", 1 << 16), iters,
        )
    if op == "sort_merge":
        return bench_sort_merge(
            job.get("b", 1024), job.get("l", 40), job.get("c", 256), iters
        )
    if op == "lut_score":
        return bench_lut_score(
            job.get("b", 1024), job.get("c", 256), job.get("m", 32),
            job.get("k", 256), job.get("n_rows", 1 << 16), iters,
        )
    raise ValueError(f"unknown kernels op {op!r}")
