"""Fused dense full_adam sweep (Pallas TPU) with an XLA fallback.

The DENSE_UPDATE_DENSE_VARIANCE ("full_adam") representation update
(updates_adam.cu:203-213,253-282,312-328) walks every row of the table and
its dense m/v moments each step.  Expressed as separate jnp ops, XLA emits
one fusion per output, so the inputs (scattered gradients, m, v, table) are
re-read per fusion — ~12 R of HBM traffic for tensors of size R.  This
kernel computes all three outputs in one pass: 4 R read + 3 R write, the
bandwidth lower bound for the math.

The kernel is purely elementwise over row blocks — no matmuls, no
DMA-scratch operands, no scalar-prefetch index maps — so it avoids every
Mosaic miscompilation documented in PERFORMANCE.md for this toolchain.

Update rule (must match optim/updates.py:_repr_adam_full exactly):

    agg = scattered - lam * table          # L2 folded into the moments
    m'  = beta1 * m + (1 - beta1) * agg
    v'  = beta2 * v + (1 - beta2) * agg^2
    table' = table + (lr * bias_correction) * m' / (sqrt(v') + eps)
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sweep_kernel(
    scale_ref,  # (1, 1) SMEM: lr * bias_correction (traced: depends on t)
    s_ref,  # [R, d] scattered ascent gradient block
    m_ref,
    v_ref,
    p_ref,
    m_out,
    v_out,
    p_out,
    *,
    beta1: float,
    beta2: float,
    lam: float,
    eps: float,
):
    s = s_ref[...]
    m = m_ref[...]
    v = v_ref[...]
    p = p_ref[...]
    agg = s - lam * p
    m_new = beta1 * m + (1.0 - beta1) * agg
    v_new = beta2 * v + (1.0 - beta2) * agg * agg
    p_out[...] = p + scale_ref[0, 0] * m_new / (jnp.sqrt(v_new) + eps)
    m_out[...] = m_new
    v_out[...] = v_new


def _sweep_pallas(
    table, m, v, scattered, step_scale, *, lam, beta1, beta2, eps,
    block_rows=512, interpret=False,
):
    n, d = table.shape
    block_rows = min(block_rows, n)
    grid = (pl.cdiv(n, block_rows),)
    row_block = pl.BlockSpec((block_rows, d), lambda i: (i, 0))
    kernel = functools.partial(
        _sweep_kernel, beta1=beta1, beta2=beta2, lam=lam, eps=eps
    )
    m_new, v_new, p_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            row_block,
            row_block,
            row_block,
            row_block,
        ],
        out_specs=(row_block, row_block, row_block),
        out_shape=(
            jax.ShapeDtypeStruct(m.shape, m.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(table.shape, table.dtype),
        ),
        input_output_aliases={2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(
        jnp.asarray(step_scale, table.dtype).reshape(1, 1),
        scattered,
        m,
        v,
        table,
    )
    return m_new, v_new, p_new


def _sweep_xla(table, m, v, scattered, step_scale, *, lam, beta1, beta2, eps):
    agg = scattered - lam * table
    m_new = beta1 * m + (1.0 - beta1) * agg
    v_new = beta2 * v + (1.0 - beta2) * jnp.square(agg)
    p_new = table + step_scale * m_new / (jnp.sqrt(v_new) + eps)
    return m_new, v_new, p_new


def fused_adam_dense_sweep(
    table, m, v, scattered, step_scale, *, lam, beta1, beta2, eps,
    interpret=False,
):
    """(m', v', table') for one full_adam dense sweep.

    ``step_scale`` is the traced scalar lr * bias_correction(t); ``lam`` is
    the static scaled regularization lambda/batch.  Dispatches to the Pallas
    kernel on TPU float32 (override off with CUNVSM_FUSED_ADAM=0), XLA
    elsewhere (CPU float64 tests exercise the identical formula).
    """
    use_pallas = os.environ.get("CUNVSM_FUSED_ADAM", "1") == "1"
    on_tpu = jax.default_backend() in ("tpu", "axon")
    lam_static = isinstance(lam, (int, float))
    if (interpret and lam_static) or (
        use_pallas
        and on_tpu
        and lam_static
        and table.dtype == jnp.float32
        and scattered.dtype == table.dtype
        and m.shape == table.shape
        and v.shape == table.shape
    ):
        return _sweep_pallas(
            table, m, v, scattered, step_scale,
            lam=lam, beta1=beta1, beta2=beta2, eps=eps, interpret=interpret,
        )
    return _sweep_xla(
        table, m, v, scattered, step_scale,
        lam=lam, beta1=beta1, beta2=beta2, eps=eps,
    )
