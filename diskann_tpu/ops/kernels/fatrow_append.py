"""In-place fat-row backedge append: one tiny DMA per record section.

XLA scatter is the wrong tool for the build's backedge append — TPU
scatter lowering is effectively serial per index (measured: 4-7 s for
512k 72-byte records into a [1M, 6144] int8 table, vs a ~4 ms bandwidth
roofline).  This kernel performs the append as E x 3 small HBM->HBM DMA
copies (id 4B, aux 4B, code dp B), issued in deep waves so the issue
latency pipelines, with the rows table aliased in-place
(`input_output_aliases`) so the 6+ GB table is never copied.

Inputs are preprocessed in XLA (cheap, elementwise):
- edges compacted so invalid ones point at the table's sacrificial DUMP
  row (index cap, allocated by `graph/packed.py`), making every DMA
  unconditional;
- per-edge record bytes laid out as recs[E, 128] = [id(4) | aux(4) |
  code(dp) | pad].

Reference analogue: the in-place adjacency patching of IP-DiskANN
(`diskann/src/graph/index.rs:1558`) — here applied to the packed sector
mirror."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diskann_tpu.graph.packed import id_sectors, n_sectors

EDGE_BLOCK = 2048     # edges per grid program
INFLIGHT = 128        # DMA ring depth (per section stream)


def _kernel(rp: int, dp: int, e_total: int,
            tgt_ref, slot_ref, recs_hbm, rows_hbm, rows_out, sem):
    del rows_hbm  # aliased with rows_out; writes go through the OUTPUT ref
    # (the interpreter discards DMA writes to an aliased *input* ref)
    p = pl.program_id(0)
    base = p * EDGE_BLOCK
    id_s = id_sectors(rp)
    nsec = n_sectors(rp, dp)
    cpl = 128 // dp       # codes per sector (dp divides 128 by layout rule)

    def dmas(j, slot_ring):
        idx = base + j
        t = tgt_ref[idx]
        s = slot_ref[idx]
        srow = t * nsec
        d_id = pltpu.make_async_copy(
            recs_hbm.at[pl.ds(idx, 1), pl.ds(0, 4)],
            rows_out.at[pl.ds(srow + s // 32, 1), pl.ds((s % 32) * 4, 4)],
            sem.at[slot_ring, 0],
        )
        d_aux = pltpu.make_async_copy(
            recs_hbm.at[pl.ds(idx, 1), pl.ds(4, 4)],
            rows_out.at[
                pl.ds(srow + id_s + s // 32, 1), pl.ds((s % 32) * 4, 4)
            ],
            sem.at[slot_ring, 1],
        )
        d_code = pltpu.make_async_copy(
            recs_hbm.at[pl.ds(idx, 1), pl.ds(8, dp)],
            rows_out.at[
                pl.ds(srow + 2 * id_s + s // cpl, 1),
                pl.ds((s % cpl) * dp, dp),
            ],
            sem.at[slot_ring, 2],
        )
        return d_id, d_aux, d_code

    def start(j, _):
        for d in dmas(j, jnp.mod(j, INFLIGHT)):
            d.start()
        return 0

    def wait(j, _):
        for d in dmas(j, jnp.mod(j, INFLIGHT)):
            d.wait()
        return 0

    # prologue: fill the ring
    jax.lax.fori_loop(0, INFLIGHT, start, 0)

    def steady(j, _):
        wait(j, 0)                      # frees ring slot j % INFLIGHT
        start(j + INFLIGHT, 0)
        return 0

    jax.lax.fori_loop(0, EDGE_BLOCK - INFLIGHT, steady, 0)
    jax.lax.fori_loop(EDGE_BLOCK - INFLIGHT, EDGE_BLOCK, wait, 0)


@functools.partial(
    jax.jit, static_argnames=("rp", "dp", "interpret"), donate_argnums=(0,)
)
def fatrow_append(rows, tgt, slot, recs, *, rp: int, dp: int,
                  interpret: bool = False):
    """rows [cap+1, ROW] i8 (last row = dump); tgt/slot [E] i32 with
    invalid edges pointing at (cap, 0); recs [E, 128] i8 record bytes.
    Returns the updated rows table (in-place aliased)."""
    e = tgt.shape[0]
    assert e % EDGE_BLOCK == 0, e
    grid = (e // EDGE_BLOCK,)
    kern = functools.partial(_kernel, rp, dp, e)
    return pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,                 # tgt, slot
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # recs
                pl.BlockSpec(memory_space=pltpu.ANY),   # rows
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((INFLIGHT, 3)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(rows.shape, rows.dtype),
        input_output_aliases={3: 0},   # rows input -> rows output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tgt, slot, recs, rows)
