"""VMEM-resident segment accumulation (Pallas, experimental round 3).

Fourth attempt at beating XLA's sorted-scatter emitter (~18 ns/row; the
word update is 512k rows = 9.3 ms, half the training step).  The three
retired kernels (PERFORMANCE.md) established on this toolchain that:

* a CONSTANT output index map keeps the output block VMEM-resident across
  grid steps (runtime flat in chunk count), and
* in-kernel dynamic-row read-modify-writes cost ~47.8 ns per loop
  iteration — so any scheme looping over every update row loses, but one
  looping only over *segments* could win: the canonical word stream has
  ~69k segment-chunk intersections for 512k rows.

Design:

* the callers' existing sort orders the stream; chunk c is the block of
  C consecutive sorted rows (sequential index maps — no scalar-prefetch
  input maps, the documented per-chunk-overhead trap);
* HOST-side (cheap XLA ops): per-chunk boundary positions (first row of
  each segment run) compacted to the front of a [num_chunks, C] position
  map by an axis-1 sort, plus per-chunk boundary counts;
* IN-KERNEL per chunk: a [C, C] run-length one-hot built from the sorted
  row ids turns duplicate collapsing into one MXU matmul
  (compacted[i] = sum of the chunk's update rows belonging to the run
  STARTING at i); then a fori_loop with the chunk's dynamic boundary
  count performs one accumulator RMW per run;
* the whole [num_rows, d] float32 accumulator is a single constant-map
  output block (v5e VMEM is large enough for [65536, 384-padded] f32;
  ``num_rows`` beyond that needs a vocab-split pass, not implemented).

Opt-in / experimental: wire-up happens only via CUNVSM_VMEM_SEGMENT=1
(optim/updates.py) after the measured win on real hardware; the
differential tests always run in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    counts_ref,  # [num_chunks] int32 (scalar prefetch): runs per chunk
    rows_ref,  # [C, 1] int32 block: sorted row ids of this chunk
    starts_ref,  # [C, 1] int32 block: 1 iff position starts a run
    pos_ref,  # [C, 1] int32 block: run-start positions, compacted front
    upd_ref,  # [C, d] update block (stream dtype)
    out_ref,  # [num_rows, d] float32 accumulator (constant map: resident)
    scratch_ref,  # [C, d] float32 VMEM: compacted run sums (dynamically
    #               row-indexed — Mosaic only lowers pl.ds on refs)
    *,
    chunk: int,
):
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    rows = rows_ref[:, 0]
    # The stream is sorted, so a chunk's destination rows span
    # [r0, r_max]; at the canonical shapes that span is ~the number of
    # distinct rows in the chunk (dozens), far below C.  Dense fast path:
    # collapse the whole chunk into a [C, d] block with a shifted one-hot
    # MXU matmul (block[w] = sum of updates with row == r0 + w) and add
    # it with ONE windowed vector read-modify-write — no per-run loop.
    # The window start is rounded down to the sublane tile (8 rows).
    r0 = (rows_ref[0, 0] // 8) * 8
    r_span = rows_ref[chunk - 1, 0] - r0

    @pl.when(r_span < chunk)
    def _dense():
        w = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        rel = (rows - r0)[None, :]
        onehot = (rel == w).astype(upd_ref.dtype)  # [C(w), C(j)]
        scratch_ref[...] = jax.lax.dot_general(
            onehot,
            upd_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )
        window = out_ref[pl.ds(r0, chunk), :]
        out_ref[pl.ds(r0, chunk), :] = window + scratch_ref[...]

    # Fallback (sparse id window, e.g. tiny batches over a huge vocab):
    # per-run compaction one-hot + one RMW per run.
    @pl.when(r_span >= chunk)
    def _sparse():
        idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
        jdx = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
        eq = rows[:, None] == rows[None, :]
        first = starts_ref[:, 0] != 0
        onehot = (eq & first[:, None] & (jdx >= idx)).astype(upd_ref.dtype)
        scratch_ref[...] = jax.lax.dot_general(
            onehot,
            upd_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=out_ref.dtype,
        )  # [C, d]: run sums at run-start slots

        def body(k, _):
            i = pos_ref[k, 0]
            r = rows_ref[i, 0]
            out_ref[pl.ds(r, 1), :] += scratch_ref[pl.ds(i, 1), :]
            return 0

        jax.lax.fori_loop(0, counts_ref[c], body, 0, unroll=False)


def vmem_segment_sum(
    upd_sorted: jax.Array,
    rows_sorted: jax.Array,
    num_rows: int,
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """Sorted segment-sum with a VMEM-resident accumulator.

    ``rows_sorted`` ascending; duplicates accumulate (atomicAdd parity,
    storage.cu:37-49).  Returns float32 (or the wide dtype) [num_rows, d].
    """
    n, d = upd_sorted.shape
    out_dtype = (
        jnp.float32 if upd_sorted.dtype == jnp.bfloat16 else upd_sorted.dtype
    )
    pad = (-n) % chunk
    if pad:
        # Padding rows target row num_rows (a spill row sliced off at the
        # end) so they never touch real output.
        rows_sorted = jnp.concatenate(
            [rows_sorted, jnp.full((pad,), num_rows, rows_sorted.dtype)]
        )
        upd_sorted = jnp.concatenate(
            [upd_sorted, jnp.zeros((pad, d), upd_sorted.dtype)]
        )
    m = n + pad
    num_chunks = m // chunk

    # Host-side (XLA) run-start map: boundary iff first of chunk or row id
    # changed; positions of boundaries compacted to the front per chunk.
    rows2 = rows_sorted.reshape(num_chunks, chunk)
    prev = jnp.concatenate(
        [jnp.full((num_chunks, 1), -1, rows2.dtype), rows2[:, :-1]], axis=1
    )
    is_start = rows2 != prev
    counts = jnp.sum(is_start, axis=1).astype(jnp.int32)
    within = jax.lax.broadcasted_iota(jnp.int32, (num_chunks, chunk), 1)
    keyed = jnp.where(is_start, within, jnp.int32(chunk))
    pos = jax.lax.sort(keyed, dimension=1)  # starts first, ascending

    grid = (num_chunks,)
    kernel = functools.partial(_kernel, chunk=chunk)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((chunk, 1), lambda c, *_: (c, 0)),
                pl.BlockSpec((chunk, 1), lambda c, *_: (c, 0)),
                pl.BlockSpec((chunk, 1), lambda c, *_: (c, 0)),
                pl.BlockSpec((chunk, d), lambda c, *_: (c, 0)),
            ],
            out_specs=pl.BlockSpec(
                (num_rows + chunk, d), lambda c, *_: (0, 0)
            ),
            scratch_shapes=[pltpu.VMEM((chunk, d), out_dtype)],
        ),
        # +chunk spill rows: padding updates land at row ``num_rows`` and
        # the dense window starting there stays in bounds; sliced off.
        out_shape=jax.ShapeDtypeStruct((num_rows + chunk, d), out_dtype),
        interpret=interpret,
    )(
        counts,
        rows_sorted.reshape(m, 1).astype(jnp.int32),
        is_start.astype(jnp.int32).reshape(m, 1),
        pos.reshape(m, 1),
        upd_sorted,
    )
    return out[:num_rows]
