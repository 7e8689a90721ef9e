"""Differential tests for the experimental VMEM-resident segment kernel
(interpret mode; the Python scatter loop is the oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cunvsm_tpu.ops.vmem_segment import vmem_segment_sum


@pytest.mark.parametrize(
    "n,hi,d,chunk",
    [
        (1000, 64, 12, 128),    # dense-window fast path
        (300, 100000, 6, 64),   # sparse fallback (huge id range)
        (2000, 5000, 8, 256),   # mixed
        (37, 16, 300, 8),       # canonical width, padding
    ],
)
def test_matches_scatter_oracle(rng, n, hi, d, chunk):
    rows = np.sort(rng.randint(0, hi, n)).astype(np.int32)
    upd = rng.randn(n, d).astype(np.float32)
    ref = np.zeros((hi, d), np.float32)
    for i in range(n):
        ref[rows[i]] += upd[i]
    got = np.asarray(
        vmem_segment_sum(
            jnp.asarray(upd), jnp.asarray(rows), hi, chunk=chunk,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
