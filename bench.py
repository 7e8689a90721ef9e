"""Training-throughput benchmark on the canonical NVSM configuration.

Measures end-to-end training-step throughput (forward + backward + full_adam
update, the SURVEY.md §3.1 hot loop) in n-gram->document training pairs per
second on one chip, at the reference's published hyperparameters
(functions.sh:369-400 + the NVSM preset functions.sh:263-271): batch 51200,
window 10, d_word 300, d_entity 256, 10 negatives, vocab 65536, hard_tanh +
batch normalization, full_adam.

Baseline constant: the CUDA reference publishes no throughput numbers
(BASELINE.md); we anchor vs_baseline to an estimated 500k pairs/s for the
original single-GPU implementation (per-batch ~24 GFLOP of GEMMs plus dense
Adam sweeps on a ~6 TFLOPS sm_52-era card at the same batch size), so
vs_baseline = measured / 5e5.  The BASELINE.json target is >5x.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


BASELINE_PAIRS_PER_SEC = 500_000.0

NUM_WORDS = 65536
NUM_ENTITIES = 262144  # collection scale (~Robust04 / 0.5M order)
WARMUP_STEPS = 3
TIMED_STEPS = 20


def main():
    import jax
    import jax.numpy as jnp

    from cunvsm_tpu.config import (
        AdamConfig,
        AdamMode,
        ModelDesc,
        Nonlinearity,
        TrainConfig,
        UpdateMethod,
    )
    from cunvsm_tpu.models.objectives import TextEntityBatch
    from cunvsm_tpu.models.params import init_params
    from cunvsm_tpu.optim.updates import Optimizer
    from cunvsm_tpu.train.step import make_train_step

    desc = ModelDesc(
        word_repr_size=300,
        entity_repr_size=256,
        nonlinearity=Nonlinearity.HARD_TANH,
        batch_normalization=True,
    )
    cfg = TrainConfig(
        batch_size=51200,
        window_size=10,
        num_random_entities=10,
        update_method=UpdateMethod.ADAM,
        adam=AdamConfig(mode=AdamMode.DENSE_UPDATE_DENSE_VARIANCE),
        learning_rate=1e-3,
        regularization_lambda=1e-2,
    )

    key = jax.random.PRNGKey(0)
    params = init_params(key, NUM_WORDS, NUM_ENTITIES, desc)
    optimizer = Optimizer(cfg)
    opt_state = optimizer.init(params)
    step = make_train_step(desc, cfg)

    rng = np.random.RandomState(0)
    B, W = cfg.batch_size, cfg.window_size
    batch = TextEntityBatch(
        features=jnp.asarray(rng.randint(0, NUM_WORDS, (B, W)), jnp.int32),
        feature_weights=jnp.ones((B, W), jnp.float32),
        labels=jnp.asarray(rng.randint(0, NUM_ENTITIES, (B,)), jnp.int32),
        weights=jnp.ones((B,), jnp.float32),
    )
    batch = jax.device_put(batch)

    for i in range(WARMUP_STEPS):
        params, opt_state, cost = step(
            params, opt_state, batch, jax.random.fold_in(key, i)
        )
    cost.block_until_ready()

    start = time.time()
    for i in range(TIMED_STEPS):
        params, opt_state, cost = step(
            params, opt_state, batch, jax.random.fold_in(key, 100 + i)
        )
    cost.block_until_ready()
    elapsed = time.time() - start

    pairs_per_sec = cfg.batch_size * TIMED_STEPS / elapsed
    print(
        json.dumps(
            {
                "metric": "train_ngram_pairs_per_sec",
                "value": round(pairs_per_sec, 1),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
