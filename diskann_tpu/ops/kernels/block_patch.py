"""In-place sector-table patching via aligned [8, 128] block DMAs.

XLA scatter serializes per index on TPU (~2-14 us/index), which makes
maintaining the packed sector table (`graph/packed.py`) the dominant cost
of graph builds: one insert batch patches ~100k sector rows.  This kernel
applies patches as HBM->HBM DMA copies of 8-row x 128-byte blocks — the
granularity Mosaic accepts for a (8,128)(4,1)-tiled int8 memref (single
[1, k] row slices are rejected: "dim0 slices must be aligned to tiling").

Patches are (block_idx, 8x128 bytes) pairs, prebuilt densely in XLA;
invalid patches point at the table's DUMP row block (the caller passes
`dump_block`), so every DMA is unconditional.  The table rides through
`input_output_aliases` and all writes go through the OUTPUT ref (the
interpreter discards DMA writes to an aliased input ref).

Reference analogue: sector writes of the SSD index builder
(`diskann-disk/src/storage/disk_index_writer.rs`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PATCH_BLOCK = 4096    # patches per grid program
INFLIGHT = 256        # DMA ring depth


def _kernel(idx_ref, vals_hbm, table_hbm, table_out, sem):
    del table_hbm  # aliased with table_out; writes go through the OUTPUT ref
    p = pl.program_id(0)
    base = p * PATCH_BLOCK

    def dma(j, ring):
        g = idx_ref[base + j]
        return pltpu.make_async_copy(
            vals_hbm.at[pl.ds((base + j) * 8, 8), :],
            table_out.at[pl.ds(g * 8, 8), :],
            sem.at[ring],
        )

    def start(j, _):
        dma(j, jnp.mod(j, INFLIGHT)).start()
        return 0

    def wait(j, _):
        dma(j, jnp.mod(j, INFLIGHT)).wait()
        return 0

    jax.lax.fori_loop(0, INFLIGHT, start, 0)

    def steady(j, _):
        wait(j, 0)                      # frees ring slot j % INFLIGHT
        start(j + INFLIGHT, 0)
        return 0

    jax.lax.fori_loop(0, PATCH_BLOCK - INFLIGHT, steady, 0)
    jax.lax.fori_loop(PATCH_BLOCK - INFLIGHT, PATCH_BLOCK, wait, 0)


@functools.partial(
    jax.jit, static_argnames=("interpret",), donate_argnums=(0,)
)
def block_patch(table, block_idx, vals, *, interpret: bool = False):
    """table [(R), 128] i8 with R % 8 == 0; block_idx [G] i32 (8-row block
    indices: block g covers table rows [8g, 8g+8)); vals [G*8, 128] i8.
    Returns the patched table (in-place aliased).  G must be a multiple of
    PATCH_BLOCK; point unused patches at a sacrificial dump block.
    Duplicate block indices must carry identical vals (DMA order is
    unspecified)."""
    g = block_idx.shape[0]
    assert g % PATCH_BLOCK == 0, g
    assert vals.shape == (g * 8, 128), (vals.shape, g)
    grid = (g // PATCH_BLOCK,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,                 # block_idx
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # vals
                pl.BlockSpec(memory_space=pl.ANY),   # table
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA((INFLIGHT,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={2: 0},   # table input -> output
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(block_idx, vals, table)


def block_patch_ref(table, block_idx, vals):
    """Pure-XLA oracle / CPU fallback (row scatter)."""
    g = block_idx.shape[0]
    rows = (
        block_idx[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]
    ).reshape(-1)
    return table.at[rows].set(vals, mode="drop")
