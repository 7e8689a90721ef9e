"""Device-trace profile of the canonical training step (real TPU).

Runs the canonical pooled NVSM step under ``jax.profiler.trace`` (which
works through the remote tunnel) and prints per-op device times aggregated
from the trace.json.gz — the methodology behind PERFORMANCE.md's "Step op
breakdown" tables.  Toggle code paths via env (CUNVSM_PREFIX_DIFF=0,
CUNVSM_PREFIX_CHUNK=..., CUNVSM_ACCUM_VARIANT=...).

Usage: python scripts/profile_step.py [--pool 2048] [--steps 10]
       [--top 40] [--outdir /tmp/trace_step]
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cunvsm_tpu.config import (
        AdamConfig, AdamMode, ModelDesc, Nonlinearity, TrainConfig,
        UpdateMethod,
    )
    from cunvsm_tpu.models.objectives import TextEntityBatch
    from cunvsm_tpu.models.params import init_params
    from cunvsm_tpu.optim.updates import Optimizer
    from cunvsm_tpu.train.step import make_train_step

    NUM_WORDS, NUM_ENTITIES = 65536, 262144
    desc = ModelDesc(
        word_repr_size=300, entity_repr_size=256,
        nonlinearity=Nonlinearity.HARD_TANH, batch_normalization=True,
    )
    cfg = TrainConfig(
        batch_size=51200, window_size=10, num_random_entities=10,
        update_method=UpdateMethod.ADAM,
        adam=AdamConfig(mode=AdamMode.DENSE_UPDATE_DENSE_VARIANCE),
        learning_rate=1e-3, regularization_lambda=1e-2,
        stream_dtype="bfloat16", window_sum_dtype="bfloat16",
        uniform_feature_weights=True,
        negative_pool_size=args.pool,
        negative_pool_stride=args.pool_stride,
    )
    params = init_params(jax.random.PRNGKey(0), NUM_WORDS, NUM_ENTITIES, desc)
    optimizer = Optimizer(cfg)
    opt_state = optimizer.init(params)
    step = make_train_step(desc, cfg, jit=False)

    rng = np.random.RandomState(0)
    B, W = cfg.batch_size, cfg.window_size

    if args.device_sampling:
        # The FULL E2E program: K steps each sampling their own batch from
        # a device-resident synthetic corpus (the path
        # scripts/e2e_throughput.py trains with), so the trace shows the
        # batch-construction ops responsible for the E2E-vs-step gap.
        from cunvsm_tpu.data.device_sampler import (
            make_device_sampled_multistep,
            make_epoch_permuter,
            prepare_device_corpus,
        )
        from cunvsm_tpu.data.synth import uniform_corpus

        corpus = uniform_corpus(
            NUM_ENTITIES, 120, NUM_WORDS, window_size=W, seed=0
        )
        dc = prepare_device_corpus(corpus)
        permuter, _ = make_epoch_permuter(dc)
        doc_perm = permuter(jax.random.PRNGKey(3))
        runf = make_device_sampled_multistep(
            desc, cfg, dc, args.steps, num_entities=NUM_ENTITIES
        )
        params, opt_state, costs = runf(
            params, opt_state, jax.random.PRNGKey(0), doc_perm, 0
        )
        np.asarray(costs)
        os.makedirs(args.outdir, exist_ok=True)
        with jax.profiler.trace(args.outdir):
            params, opt_state, costs = runf(
                params, opt_state, jax.random.PRNGKey(1), doc_perm,
                args.steps * cfg.batch_size,
            )
            np.asarray(costs)
        return args.steps

    batch = jax.device_put(TextEntityBatch(
        features=jnp.asarray(rng.randint(0, NUM_WORDS, (B, W)), jnp.int32),
        feature_weights=jnp.ones((B, W), jnp.float32),
        labels=jnp.asarray(rng.randint(0, NUM_ENTITIES, (B,)), jnp.int32),
        weights=jnp.ones((B,), jnp.float32),
    ))

    def scan_steps(params, opt_state, batch, key):
        def body(carry, k):
            p, o = carry
            p, o, c = step(p, o, batch, k)
            return (p, o), c
        (p, o), costs = jax.lax.scan(
            body, (params, opt_state), jax.random.split(key, args.steps))
        return p, o, costs

    runf = jax.jit(scan_steps, donate_argnums=(0, 1))
    params, opt_state, costs = runf(params, opt_state, batch,
                                    jax.random.PRNGKey(0))
    np.asarray(costs)  # D2H barrier after compile+first run

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir):
        params, opt_state, costs = runf(params, opt_state, batch,
                                        jax.random.PRNGKey(1))
        np.asarray(costs)
    return args.steps


def parse(outdir, steps, top):
    paths = sorted(glob.glob(
        os.path.join(outdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace found", file=sys.stderr)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device-side op events live on TensorCore pids; host threads carry
    # python/runtime noise.  Heuristic: keep complete events ("X") whose
    # process name mentions TPU/TensorCore.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TensorCore" in name or "/device:TPU" in name or "XLA Op" in name
    }
    agg = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e3  # us -> ms
        agg[name] += dur
        count[name] += 1
        total += dur
    print(f"# device total {total:.2f} ms over {steps} steps "
          f"({total / steps:.2f} ms/step); top ops (ms TOTAL over trace):")
    for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms:9.3f} ms  x{count[name]:<5d} {name[:130]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pool", type=int, default=2048)
    p.add_argument("--pool_stride", type=int, default=1)
    p.add_argument("--device_sampling", action="store_true",
                   help="profile the full E2E program (on-device batch "
                        "sampling inside the scanned step)")
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--outdir", default="/tmp/trace_step")
    p.add_argument("--parse_only", action="store_true")
    args = p.parse_args()
    if not args.parse_only:
        run(args)
    parse(args.outdir, args.steps, args.top)


if __name__ == "__main__":
    main()
