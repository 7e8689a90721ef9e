"""Pallas TPU kernels for the scatter-add hot path.

Profile motivation: XLA lowers scatter-add on TPU to a serialized update
loop (~36 GB/s); even its sorted segment-sum path runs at ~150 GB/s.  The
training step's dominant cost is accumulating per-instance gradients into
the embedding tables (the reference's atomicAdd scatter, storage.cu:37-49).

``chunk_aligned_segment_sum`` reformulates the accumulation as fully
auto-pipelined dense work:

* updates are sorted by destination row (one fused multi-operand XLA sort);
* the sorted stream is laid out so every destination row-tile owns a
  whole number of fixed-size chunks ("chunk alignment"), computed *without
  scatters* via vectorized searchsorted index arithmetic;
* the kernel runs one grid step per chunk: the chunk's rows/updates arrive
  as auto-pipelined VMEM input blocks, a one-hot matrix built from the row
  ids turns the accumulation into an MXU matmul, and the output row-tile
  block is revisited (stays in VMEM) across a tile's consecutive chunks —
  the canonical Pallas reduction pattern;
* per-tile chunk counts are data-dependent but the total chunk count is a
  static bound (U/C + T), so Zipf-skewed rows cost only their own updates
  plus at most one padded chunk per tile.

Design notes / measured dead ends on this toolchain (PERFORMANCE.md):

* a manual double-buffered DMA variant miscompiles (Mosaic crashes on
  matmuls whose operands derive from DMA'd scratch);
* ``chunk_aligned_segment_sum`` (auto-pipelined, output-block revisiting)
  is defeated by its scalar-prefetch-dependent output index map — Mosaic
  flushes the accumulator tile every chunk;
* ``scratch_segment_sum`` (float32 VMEM scratch accumulator + explicit
  copy-out DMA, transposed one-hot so the MXU contraction needs no
  transpose) is correct but measured 60-106 ms vs XLA's 4-8 ms at the
  real shapes — per-chunk overhead with prefetch-dependent input maps
  dominates.  It remains valuable where exact f32 accumulation of bf16
  streams matters (the XLA path materializes a converted full-width
  stream).

The public ``sorted_segment_sum`` entry point therefore dispatches to
``jax.ops.segment_sum`` (XLA's sorted-scatter path) by default; the Pallas
kernels are opt-in via CUNVSM_PALLAS_SEGMENT=1.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    chunk_tile_ref,  # [K] int32: tile id of each chunk (scalar prefetch)
    first_flag_ref,  # [K] int32: 1 iff chunk is its tile's first (prefetch)
    rows_ref,  # [C, 1] int32 block: padded sorted row ids
    upd_ref,  # [C, d] block: padded sorted updates
    out_ref,  # [R, d] tile block (revisited across a tile's chunks)
    *,
    tile_rows: int,
):
    k = pl.program_id(0)
    chunk, _ = rows_ref.shape

    @pl.when(first_flag_ref[k] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    local = rows_ref[:, 0] - chunk_tile_ref[k] * tile_rows  # [C]
    # Padding rows carry an id outside every tile -> all-zero one-hot column.
    onehot = (
        local[:, None]
        == jax.lax.broadcasted_iota(jnp.int32, (chunk, tile_rows), 1)
    ).astype(upd_ref.dtype)
    out_ref[...] += jax.lax.dot_general(
        onehot,
        upd_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


def _chunk_align(
    rows_sorted: jax.Array,  # [U] int32 ascending
    num_rows_pad: int,
    tile_rows: int,
    chunk: int,
):
    """Compute the chunk-aligned layout of the sorted update stream.

    Returns (src, valid, chunk_tile, first_flag) where position p of the
    padded stream takes sorted update ``src[p]`` when ``valid[p]`` (else
    padding), and chunk k accumulates into row tile ``chunk_tile[k]``.
    All pure gathers/searchsorted — no scatters.
    """
    U = rows_sorted.shape[0]
    T = num_rows_pad // tile_rows
    K = U // chunk + T + 1  # static chunk-count bound
    L = K * chunk

    # Per-tile slice boundaries of the sorted stream.
    starts = jnp.searchsorted(
        rows_sorted, jnp.arange(0, num_rows_pad + 1, tile_rows, dtype=jnp.int32)
    ).astype(jnp.int32)  # [T+1]
    counts = starts[1:] - starts[:-1]
    # Every tile gets at least one (possibly all-padding) chunk so its
    # output block is always visited and zero-initialized — unvisited Pallas
    # output blocks would hold garbage.
    aligned_counts = jnp.maximum(
        ((counts + chunk - 1) // chunk) * chunk, chunk
    )
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(aligned_counts, dtype=jnp.int32)]
    )  # [T+1]

    p = jnp.arange(L, dtype=jnp.int32)
    t_of_p = (
        jnp.searchsorted(aligned_starts, p, side="right").astype(jnp.int32) - 1
    )
    t_of_p = jnp.clip(t_of_p, 0, T - 1)
    offset = p - jnp.take(aligned_starts, t_of_p)
    src = jnp.take(starts, t_of_p) + offset
    valid = offset < jnp.take(counts, t_of_p)

    kidx = jnp.arange(K, dtype=jnp.int32)
    chunk_tile = (
        jnp.searchsorted(
            aligned_starts, kidx * chunk, side="right"
        ).astype(jnp.int32)
        - 1
    )
    chunk_tile = jnp.clip(chunk_tile, 0, T - 1)
    first_flag = jnp.concatenate(
        [jnp.ones((1,), jnp.int32),
         (chunk_tile[1:] != chunk_tile[:-1]).astype(jnp.int32)]
    )
    return src, valid, chunk_tile, first_flag


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "tile_rows", "chunk", "interpret"),
)
def chunk_aligned_segment_sum(
    upd_sorted: jax.Array,  # [U, d], sorted by row
    rows_sorted: jax.Array,  # [U] int32 ascending
    num_rows: int,
    tile_rows: int = 256,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """S[r] = sum of upd_sorted rows with rows_sorted == r (Pallas)."""
    U, d = upd_sorted.shape
    T = pl.cdiv(num_rows, tile_rows)
    num_rows_pad = T * tile_rows
    if U == 0:
        return jnp.zeros((num_rows, d), upd_sorted.dtype)

    rows_i32 = rows_sorted.astype(jnp.int32)
    src, valid, chunk_tile, first_flag = _chunk_align(
        rows_i32, num_rows_pad, tile_rows, chunk
    )
    src_c = jnp.where(valid, src, 0)
    rows_pad = jnp.where(
        valid, jnp.take(rows_i32, src_c), num_rows_pad
    ).reshape(-1, 1)
    upd_pad = jnp.take(upd_sorted, src_c, axis=0) * valid[:, None].astype(
        upd_sorted.dtype
    )

    K = chunk_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda k, ct, ff: (k, 0)),
            pl.BlockSpec((chunk, d), lambda k, ct, ff: (k, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile_rows, d), lambda k, ct, ff: (ct[k], 0)
        ),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, tile_rows=tile_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows_pad, d), upd_sorted.dtype),
        interpret=interpret,
    )(chunk_tile, first_flag, rows_pad, upd_pad)
    return out[:num_rows]


def _scratch_kernel(
    chunk_tile_ref,  # [K] int32 (scalar prefetch): tile id of each chunk
    first_flag_ref,  # [K] int32: 1 iff chunk is its tile's first
    last_flag_ref,  # [K] int32: 1 iff chunk is its tile's last
    rows_ref,  # [C, 1] int32 block: padded sorted row ids
    upd_ref,  # [C, d] block: padded sorted updates (any dtype)
    out_ref,  # [T*R, d] f32 in ANY/HBM (written via explicit DMA)
    acc_ref,  # scratch VMEM [R, d] f32 accumulator
    sem,  # DMA semaphore
    *,
    tile_rows: int,
):
    k = pl.program_id(0)
    tile = chunk_tile_ref[k]
    chunk, _ = rows_ref.shape

    def tile_copy(t):
        return pltpu.make_async_copy(
            acc_ref,
            out_ref.at[pl.ds(t * tile_rows, tile_rows), :],
            sem,
        )

    @pl.when(jnp.logical_and(first_flag_ref[k] == 1, k > 0))
    def _():
        # The previous tile's copy-out must land before the scratch is
        # reused (sub-microsecond for a VMEM->HBM tile; chunks are longer).
        tile_copy(chunk_tile_ref[k - 1]).wait()

    @pl.when(first_flag_ref[k] == 1)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    local = rows_ref[:, 0] - tile * tile_rows  # [C]
    # Padding rows carry an id outside every tile -> all-zero one-hot row.
    # Built directly in [R, C] orientation so the MXU contraction is a
    # plain [R, C] x [C, d] matmul (a [C, R] one-hot with a dim-0
    # contraction costs Mosaic an explicit transpose per chunk).
    onehot_t = (
        jax.lax.broadcasted_iota(jnp.int32, (tile_rows, chunk), 0)
        == local[None, :]
    ).astype(upd_ref.dtype)
    acc_ref[...] += jax.lax.dot_general(
        onehot_t,
        upd_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(last_flag_ref[k] == 1)
    def _():
        tile_copy(tile).start()

    @pl.when(k == pl.num_programs(0) - 1)
    def _():
        tile_copy(tile).wait()


@functools.partial(
    jax.jit,
    static_argnames=("num_rows", "tile_rows", "chunk", "interpret"),
)
def scratch_segment_sum(
    upd_sorted: jax.Array,  # [U, d], sorted by row (any float dtype)
    rows_sorted: jax.Array,  # [U] int32 ascending
    num_rows: int,
    tile_rows: int = 512,
    chunk: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """f32 S[r] = sum of upd_sorted rows with rows_sorted == r.

    Variant of ``chunk_aligned_segment_sum`` that accumulates each row
    tile in a float32 VMEM scratch and copies it out with an explicit DMA
    when the tile's last chunk retires.  This keeps the accumulator
    resident without relying on Mosaic's output-block revisit detection
    (defeated by scalar-prefetch output index maps on this toolchain,
    see the module docstring), keeps the matmul operands auto-pipelined
    input blocks (the DMA-scratch-operand miscompile does not apply), and
    accumulates bf16 update streams exactly in float32 — the XLA scatter
    path must otherwise materialize a full-width converted stream.
    """
    U, d = upd_sorted.shape
    T = pl.cdiv(num_rows, tile_rows)
    num_rows_pad = T * tile_rows
    if U == 0:
        return jnp.zeros((num_rows, d), jnp.float32)

    # The explicit copy-out slices along the lane dimension, which Mosaic
    # requires 128-aligned; pad the feature dimension for the kernel and
    # strip it afterwards.
    d_pad = ((d + 127) // 128) * 128

    rows_i32 = rows_sorted.astype(jnp.int32)
    src, valid, chunk_tile, first_flag = _chunk_align(
        rows_i32, num_rows_pad, tile_rows, chunk
    )
    src_c = jnp.where(valid, src, 0)
    rows_pad = jnp.where(
        valid, jnp.take(rows_i32, src_c), num_rows_pad
    ).reshape(-1, 1)
    upd_pad = jnp.take(upd_sorted, src_c, axis=0) * valid[:, None].astype(
        upd_sorted.dtype
    )
    if d_pad != d:
        upd_pad = jnp.pad(upd_pad, ((0, 0), (0, d_pad - d)))
    last_flag = jnp.concatenate(
        [first_flag[1:], jnp.ones((1,), jnp.int32)]
    )

    K = chunk_tile.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(K,),
        in_specs=[
            pl.BlockSpec((chunk, 1), lambda k, ct, ff, lf: (k, 0)),
            pl.BlockSpec((chunk, d_pad), lambda k, ct, ff, lf: (k, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((tile_rows, d_pad), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        functools.partial(_scratch_kernel, tile_rows=tile_rows),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows_pad, d_pad), jnp.float32),
        interpret=interpret,
    )(chunk_tile, first_flag, last_flag, rows_pad, upd_pad)
    return out[:num_rows, :d]


# Backwards-compatible alias used by tests.
def sorted_segment_sum_pallas(
    upd_sorted, rows_sorted, num_rows, tile_rows=256, chunk=512,
    interpret=False,
):
    return chunk_aligned_segment_sum(
        upd_sorted, rows_sorted, num_rows,
        tile_rows=tile_rows, chunk=chunk, interpret=interpret,
    )


def sorted_segment_sum(
    upd_sorted: jax.Array,
    rows_sorted: jax.Array,
    num_rows: int,
    interpret: bool = False,
) -> jax.Array:
    """Dispatch: XLA sorted segment_sum by default; the Pallas kernel is
    opt-in via CUNVSM_PALLAS_SEGMENT=1.

    Measured on v5e (see PERFORMANCE.md): XLA's sorted path streams at
    ~150 GB/s (4 ms for 512k x 300 updates) while this kernel's
    scalar-dependent output index map defeats Mosaic's block-revisiting —
    the accumulator tile is flushed and reloaded on every chunk, an extra
    ~1.5 GB of traffic that makes it ~15x slower.  Revisit when the
    toolchain supports revisit detection through scalar-prefetch maps (or
    manual-DMA accumulators stop miscompiling, see the module docstring).
    """
    backend = jax.default_backend()
    use_pallas = os.environ.get("CUNVSM_PALLAS_SEGMENT", "0") == "1"
    if interpret or (use_pallas and backend in ("tpu", "axon")):
        return chunk_aligned_segment_sum(
            upd_sorted, rows_sorted, num_rows, interpret=interpret
        )
    return jax.ops.segment_sum(
        upd_sorted,
        rows_sorted,
        num_segments=num_rows,
        indices_are_sorted=True,
    )
