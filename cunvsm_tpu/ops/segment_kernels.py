"""Pallas TPU kernel for sorted segment-sum (the scatter-add hot path).

Profile motivation: XLA lowers both `scatter-add` and sorted `segment_sum`
on TPU to a serialized update loop running at ~36 GB/s — it dominates the
training step (the reference's equivalent is the atomicAdd scatter kernel,
storage.cu:37-49).  This kernel reformulates the accumulation as a streaming
CSR-style reduction:

* updates are pre-sorted by destination row (XLA sort, cheap);
* the destination table is processed in row tiles; a scalar-prefetched
  ``tile_starts`` array gives each tile its slice of the sorted update
  stream (row-aligned, so tiles never overlap);
* each tile DMAs fixed-size chunks of updates into VMEM with a double
  buffer and accumulates them with a one-hot matmul on the MXU:
  ``acc += onehot(local_rows)^T @ chunk`` — turning the serialized scatter
  into dense MXU work;
* per-tile trip counts are dynamic (a `while_loop`), so Zipf-skewed rows
  (frequent vocabulary terms) cost only their own updates.

The public entry point ``sorted_segment_sum`` falls back to
``jax.ops.segment_sum`` on non-TPU backends and for interpret-mode testing.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    tile_starts_ref,  # [T+1] int32, scalar-prefetched
    rows_ref,  # [U_pad, 1] int32 in ANY/HBM (sorted)
    upd_ref,  # [U_pad, d] float32 in ANY/HBM
    out_ref,  # [R, d] VMEM tile
    rows_scratch,  # [2, C, 1] int32 VMEM
    upd_scratch,  # [2, C, d] float32 VMEM
    acc_scratch,  # [R, d] float32 VMEM
    sems,  # DMA semaphores [2, 2]
    *,
    chunk: int,
    tile_rows: int,
):
    t = pl.program_id(0)
    start = tile_starts_ref[t]
    end = tile_starts_ref[t + 1]
    base = t * tile_rows

    acc_scratch[...] = jnp.zeros_like(acc_scratch)

    def copy_in(slot, off):
        rows_dma = pltpu.make_async_copy(
            rows_ref.at[pl.ds(off, chunk), :],
            rows_scratch.at[slot],
            sems.at[slot, 0],
        )
        upd_dma = pltpu.make_async_copy(
            upd_ref.at[pl.ds(off, chunk), :],
            upd_scratch.at[slot],
            sems.at[slot, 1],
        )
        return rows_dma, upd_dma

    @pl.when(start < end)
    def _():
        # Warm up the pipeline with the first chunk.
        for dma in copy_in(0, start):
            dma.start()

        def body(state):
            off, slot = state
            next_off = off + chunk

            @pl.when(next_off < end)
            def _():
                for dma in copy_in(1 - slot, next_off):
                    dma.start()

            for dma in copy_in(slot, off):
                dma.wait()

            local = rows_scratch[slot, :, 0] - base  # [C]
            # One-hot accumulate on the MXU: [R, C] @ [C, d].  Updates past
            # `end` belong to later tiles (or padding) and have local >=
            # tile_rows, so their one-hot column is all-zero.
            valid = jnp.logical_and(
                local >= 0,
                jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0]
                < (end - off),
            )
            local = jnp.where(valid, local, tile_rows)
            onehot = (
                local[:, None]
                == jax.lax.broadcasted_iota(
                    jnp.int32, (chunk, tile_rows), 1
                )
            ).astype(upd_scratch.dtype)
            acc_scratch[...] += jax.lax.dot_general(
                onehot,
                upd_scratch[slot],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return next_off, 1 - slot

        jax.lax.while_loop(
            lambda s: s[0] < end, body, (start, jnp.int32(0))
        )

    out_ref[...] = acc_scratch[...]


def _pad_to(x: jax.Array, n: int, axis: int = 0, value=0) -> jax.Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "tile_rows", "chunk", "interpret"),
)
def sorted_segment_sum_pallas(
    upd_sorted: jax.Array,  # [U, d] float32, sorted by row
    rows_sorted: jax.Array,  # [U] int32, ascending
    num_rows: int,
    tile_rows: int = 256,
    chunk: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """S[r] = sum of upd_sorted rows whose rows_sorted == r."""
    U, d = upd_sorted.shape
    T = pl.cdiv(num_rows, tile_rows)
    num_rows_pad = T * tile_rows

    # Pad the update stream so fixed-size chunk DMAs never run off the end;
    # padding rows point at `num_rows_pad` (outside every tile).
    U_pad = ((U + chunk - 1) // chunk) * chunk + chunk
    rows_p = _pad_to(
        rows_sorted.astype(jnp.int32), U_pad, value=num_rows_pad
    ).reshape(-1, 1)
    upd_p = _pad_to(upd_sorted, U_pad)

    # Row-aligned slice boundaries per tile.
    tile_starts = jnp.searchsorted(
        rows_sorted.astype(jnp.int32),
        jnp.arange(0, num_rows_pad + 1, tile_rows, dtype=jnp.int32),
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, d), lambda t, starts: (t, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, chunk, 1), jnp.int32),
            pltpu.VMEM((2, chunk, d), upd_sorted.dtype),
            pltpu.VMEM((tile_rows, d), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, tile_rows=tile_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows_pad, d), jnp.float32),
        interpret=interpret,
    )(tile_starts, rows_p, upd_p)
    return out[:num_rows].astype(upd_sorted.dtype)


def sorted_segment_sum(
    upd_sorted: jax.Array,
    rows_sorted: jax.Array,
    num_rows: int,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch: Pallas kernel on TPU (opt-in), XLA segment_sum otherwise.

    The Pallas path is gated behind CUNVSM_PALLAS_SEGMENT=1 until it is
    validated on the target toolchain (this environment's remote Mosaic
    compiler currently rejects the kernel); XLA's sorted-scatter path runs at
    ~150 GB/s which is already several times faster than its unsorted
    scatter.
    """
    import os

    backend = jax.default_backend()
    use_pallas = os.environ.get("CUNVSM_PALLAS_SEGMENT") == "1"
    if interpret or (use_pallas and backend in ("tpu", "axon")):
        return sorted_segment_sum_pallas(
            upd_sorted, rows_sorted, num_rows, interpret=interpret
        )
    return jax.ops.segment_sum(
        upd_sorted,
        rows_sorted,
        num_segments=num_rows,
        indices_are_sorted=True,
    )
