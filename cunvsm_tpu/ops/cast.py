"""Bandwidth-roofline dtype cast for the mixed-precision table streams.

Every training step casts the float32 master word table to the bfloat16
stream copy that feeds the forward gathers and gradient streams
(models/objectives.py, TrainConfig.stream_dtype).  XLA's standalone
convert of the [65536, 300] table measured 1.34 ms/step on v5e — ~88 GB/s
for a 118 MB read+write, 8x off the memory roofline.  This trivial Pallas
row-block kernel (same no-matmul, no-scratch, no-prefetch shape as
ops/adam_sweep.py, the pattern that works on this Mosaic build) does the
identical convert at the streaming rate.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _cast_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...].astype(o_ref.dtype)


def _cast_pallas(x, dtype, block_rows=1024, interpret=False):
    n, d = x.shape
    block_rows = min(block_rows, n)
    row_block = pl.BlockSpec((block_rows, d), lambda i: (i, 0))
    return pl.pallas_call(
        _cast_kernel,
        grid=(pl.cdiv(n, block_rows),),
        in_specs=[row_block],
        out_specs=row_block,
        out_shape=jax.ShapeDtypeStruct(x.shape, dtype),
        interpret=interpret,
    )(x)


def cast_table(x: jax.Array, dtype, interpret: bool = False) -> jax.Array:
    """x.astype(dtype) at the HBM streaming rate for 2-D float tables.

    Bit-identical to ``astype`` (same convert instruction); Pallas on TPU
    (CUNVSM_PALLAS_CAST=0 reverts), plain astype elsewhere.
    """
    dtype = jnp.dtype(dtype)
    if x.dtype == dtype:
        return x
    use_pallas = os.environ.get("CUNVSM_PALLAS_CAST", "1") == "1"
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (interpret or (use_pallas and on_tpu)) and x.ndim == 2:
        return _cast_pallas(x, dtype, interpret=interpret)
    return x.astype(dtype)
