"""Sorted segment-sum entry point for the gradient-accumulation hot path.

This replaces the reference's atomicAdd embedding scatter
(update_repr_kernel, /root/reference/cpp/storage.cu:37-49).  On TPU, XLA
lowers an unsorted ``Array.at[].add`` to a serialized scatter loop
(~36 GB/s measured on v5e); pre-sorting the indices (optim/updates.py) lets
XLA use its much faster sorted-scatter path, and duplicate indices still
accumulate exactly like atomicAdd.

Three generations of Pallas replacements for this op were built, measured,
and retired on this toolchain — the full investigation (why
scalar-prefetch-dependent index maps defeat Mosaic's output-block
revisiting, why DMA-scratch matmul operands miscompile, and the measured
47.8 ns/row floor of in-kernel dynamic row updates) now lives in
PERFORMANCE.md ("Retired: Pallas segment kernels"); git history holds the
kernels.  The shipped fast path for the canonical weight-free word update
is ``cunvsm_tpu.ops.prefix_diff`` — it removes the scatter entirely rather
than trying to out-emit it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sorted_segment_sum(
    upd_sorted: jax.Array,
    rows_sorted: jax.Array,
    num_rows: int,
) -> jax.Array:
    """out[v] = sum of ``upd_sorted`` rows whose ``rows_sorted`` id is v.

    ``rows_sorted`` must be sorted ascending (the callers sort); XLA's
    sorted-scatter path streams at ~150 GB/s on v5e vs ~36 GB/s unsorted.
    """
    return jax.ops.segment_sum(
        upd_sorted,
        rows_sorted,
        num_segments=num_rows,
        indices_are_sorted=True,
    )
