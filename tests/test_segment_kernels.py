"""Interpret-mode correctness tests for the Pallas sorted-segment-sum."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cunvsm_tpu.ops.segment_kernels import sorted_segment_sum_pallas


def reference(upd, rows, num_rows):
    out = np.zeros((num_rows, upd.shape[1]))
    for r, u in zip(np.asarray(rows), np.asarray(upd)):
        out[r] += u
    return out


@pytest.mark.parametrize(
    "U,num_rows,d,tile_rows,chunk",
    [
        (1000, 64, 8, 16, 128),
        (513, 100, 16, 32, 64),  # non-divisible everything
        (4096, 256, 128, 128, 256),
        (100, 1024, 8, 128, 128),  # sparse: most rows empty
    ],
)
def test_matches_reference(U, num_rows, d, tile_rows, chunk):
    rng = np.random.RandomState(0)
    rows = np.sort(rng.randint(0, num_rows, U)).astype(np.int32)
    upd = rng.randn(U, d).astype(np.float32)
    got = sorted_segment_sum_pallas(
        jnp.asarray(upd),
        jnp.asarray(rows),
        num_rows,
        tile_rows=tile_rows,
        chunk=chunk,
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), reference(upd, rows, num_rows), rtol=1e-5, atol=1e-5
    )


def test_skewed_rows():
    # Zipf-like skew: one hot row receives most updates.
    rng = np.random.RandomState(1)
    U, num_rows, d = 2048, 64, 8
    rows = np.concatenate(
        [np.zeros(1500, np.int32), rng.randint(1, num_rows, U - 1500)]
    )
    rows = np.sort(rows).astype(np.int32)
    upd = rng.randn(U, d).astype(np.float32)
    got = sorted_segment_sum_pallas(
        jnp.asarray(upd), jnp.asarray(rows), num_rows,
        tile_rows=16, chunk=128, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got), reference(upd, rows, num_rows), rtol=1e-4, atol=1e-4
    )


def test_empty_updates():
    got = sorted_segment_sum_pallas(
        jnp.zeros((0, 8), jnp.float32),
        jnp.zeros((0,), jnp.int32),
        32,
        tile_rows=16,
        chunk=64,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.zeros((32, 8)))


def test_entirely_empty_tiles_are_zero():
    """Row tiles receiving no updates must come back exactly zero (their
    output blocks are visited by an all-padding chunk)."""
    rng = np.random.RandomState(2)
    U, num_rows, d = 300, 1024, 8
    rows = np.sort(rng.randint(0, 10, U)).astype(np.int32)  # tiles 1..7 empty
    upd = rng.randn(U, d).astype(np.float32)
    got = np.asarray(
        sorted_segment_sum_pallas(
            jnp.asarray(upd), jnp.asarray(rows), num_rows,
            tile_rows=128, chunk=64, interpret=True,
        )
    )
    np.testing.assert_allclose(
        got, reference(upd, rows, num_rows), rtol=1e-5, atol=1e-5
    )
    assert np.all(got[128:] == 0.0)


class TestScratchSegmentSum:
    """The scratch-accumulator variant (f32 VMEM accumulation + explicit
    copy-out) must match a float64 reference under every skew."""

    @pytest.mark.parametrize(
        "num_updates,num_rows,dim,skew",
        [(5000, 1024, 300, 1.0), (3000, 700, 128, 0.2),
         (100, 2048, 64, 3.0), (7000, 64, 8, 0.05), (0, 128, 16, 1.0)],
    )
    def test_matches_reference(self, num_updates, num_rows, dim, skew):
        from cunvsm_tpu.ops.segment_kernels import scratch_segment_sum

        rng = np.random.RandomState(3)
        rows = np.sort(
            (num_rows * rng.power(max(skew, 0.01), num_updates)).astype(
                np.int32
            ) % num_rows
        )
        upd = rng.randn(num_updates, dim).astype(np.float32)
        got = np.asarray(scratch_segment_sum(
            jnp.asarray(upd), jnp.asarray(rows), num_rows,
            tile_rows=256, chunk=128, interpret=True,
        ))
        want = np.zeros((num_rows, dim), np.float64)
        np.add.at(want, rows, upd.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-5)

    def test_bf16_updates_accumulate_in_f32(self):
        from cunvsm_tpu.ops.segment_kernels import scratch_segment_sum

        rng = np.random.RandomState(4)
        rows = np.sort(rng.randint(0, 50, 20000).astype(np.int32))
        upd = jnp.asarray(rng.randn(20000, 32).astype(np.float32),
                          jnp.bfloat16)
        got = np.asarray(scratch_segment_sum(
            upd, jnp.asarray(rows), 50, tile_rows=64, chunk=256,
            interpret=True,
        ))
        assert got.dtype == np.float32
        # f32 accumulation of the bf16 inputs: compare against the f64 sum
        # of the *rounded* inputs — bf16 accumulation would be ~100x worse.
        want = np.zeros((50, 32), np.float64)
        np.add.at(want, rows, np.asarray(upd, np.float64))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)
