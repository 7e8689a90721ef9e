"""Standalone segment-accumulation benchmark on real TPU.

Compares XLA's sorted scatter path against the Pallas scratch-accumulator
kernel at the two real accumulate shapes of the canonical NVSM step.

Usage: python scripts/bench_segment.py --impl xla|scratch [--tile 512]
       [--chunk 512] [--shape word|entity]
"""

import argparse
import json
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", required=True)
    ap.add_argument("--shape", default="word")
    ap.add_argument("--tile", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.shape == "word":
        U, R, d = 512000, 65536, 300
    else:
        U, R, d = 563200, 262144, 256

    rng = np.random.RandomState(0)
    rows = np.sort(rng.randint(0, R, U).astype(np.int32))
    upd = rng.randn(U, d).astype(np.float32)
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rows_d = jax.device_put(jnp.asarray(rows))
    upd_d = jax.device_put(jnp.asarray(upd, dt))

    if args.impl == "xla":
        def one(u, r):
            return jax.ops.segment_sum(
                u.astype(jnp.float32), r, num_segments=R,
                indices_are_sorted=True,
            )
    else:
        from cunvsm_tpu.ops.segment_kernels import scratch_segment_sum

        def one(u, r):
            return scratch_segment_sum(
                u, r, R, tile_rows=args.tile, chunk=args.chunk
            )

    def scan_fn(u, r, key):
        def body(carry, k):
            # Perturb updates cheaply so iterations can't be CSE'd.
            s = one(u * (1.0 + 1e-6 * k[0].astype(u.dtype)), r)
            return carry + jnp.sum(s), None

        acc, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jax.random.split(key, args.steps).astype(jnp.uint32)[:, :1].astype(jnp.int32),
        )
        return acc

    run = jax.jit(scan_fn)
    t0 = time.time()
    np.asarray(run(upd_d, rows_d, jax.random.PRNGKey(0)))
    compile_s = time.time() - t0
    best = float("inf")
    for i in range(3):
        t0 = time.time()
        np.asarray(run(upd_d, rows_d, jax.random.PRNGKey(i)))
        best = min(best, time.time() - t0)
    print(json.dumps({
        "impl": args.impl, "shape": args.shape, "tile": args.tile,
        "chunk": args.chunk, "dtype": args.dtype,
        "ms": round(1000 * best / args.steps, 2),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    sys.exit(main())
