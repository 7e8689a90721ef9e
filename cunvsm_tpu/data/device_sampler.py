"""On-device instance sampling: the fully TPU-native data path.

The host pipeline (instances.py) replicates the reference's epoch semantics
exactly but ships every batch over host->device transfer.  For stochastic
training (the canonical NVSM/LSE configuration) the sampling itself is just
"uniform document, uniform window position" — expressible in jax — so the
packed token array can live in HBM and the *training step samples its own
batch* inside the same compiled program.  The host sends nothing per step
but a PRNG key.

Semantics vs the reference's StochasticInstanceGenerator
(data_indri.cpp:224-410): the reference draws a fixed
ceil(avg_len - w + 1) samples per document per epoch and globally shuffles;
this sampler draws documents i.i.d. uniformly per batch — identical in
expectation (every eligible document equally likely per draw), without the
exact per-epoch per-document count guarantee.  Weighting strategies are
supported on device (UNIFORM -> 1; INV_DOC_FREQUENCY -> avg_len/len;
self-information feature weights via a device table).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from cunvsm_tpu.data.corpus import Corpus
from cunvsm_tpu.data.instances import FeatureWeighting, Weighting
from cunvsm_tpu.models.objectives import TextEntityBatch


class DeviceCorpus(NamedTuple):
    """Device-resident packed corpus slices needed for sampling."""

    tokens: jax.Array  # [total_tokens] int32
    doc_offsets: jax.Array  # [num_docs] int64->int32 start offsets
    doc_lengths: jax.Array  # [num_docs] int32 in-vocab lengths
    eligible: jax.Array  # [num_eligible] int32 doc ids with len >= window
    inv_doc_weight: jax.Array  # [num_docs] float32 instance weights
    term_weights: Optional[jax.Array]  # [vocab] float32 or None
    window_size: int


def prepare_device_corpus(
    corpus: Corpus,
    weighting: Weighting = Weighting.UNIFORM,
    feature_weighting: FeatureWeighting = FeatureWeighting.UNIFORM,
) -> DeviceCorpus:
    w = corpus.window_size
    lengths = corpus.doc_lengths.astype(np.int32)
    eligible = np.flatnonzero(lengths >= w).astype(np.int32)
    if weighting == Weighting.INV_DOC_FREQUENCY:
        avg = float(lengths[eligible].mean()) if len(eligible) else 0.0
        inv = (avg / np.maximum(lengths, 1)).astype(np.float32)
    else:
        inv = np.ones(len(lengths), np.float32)
    term_weights = None
    if feature_weighting == FeatureWeighting.SELF_INFORMATION:
        term_weights = jnp.asarray(
            corpus.vocab.self_information().astype(np.float32)
        )
    return DeviceCorpus(
        tokens=jnp.asarray(corpus.tokens, jnp.int32),
        doc_offsets=jnp.asarray(corpus.doc_offsets[:-1], jnp.int32),
        doc_lengths=jnp.asarray(lengths),
        eligible=jnp.asarray(eligible),
        inv_doc_weight=jnp.asarray(inv),
        term_weights=term_weights,
        window_size=w,
    )


def sample_batch(
    dc: DeviceCorpus, key: jax.Array, batch_size: int
) -> TextEntityBatch:
    """Sample one training batch on device (jit-compatible)."""
    k_doc, k_pos = jax.random.split(key)
    eligible_idx = jax.random.randint(
        k_doc, (batch_size,), 0, dc.eligible.shape[0]
    )
    docs = jnp.take(dc.eligible, eligible_idx)
    lengths = jnp.take(dc.doc_lengths, docs)
    max_pos = lengths - dc.window_size + 1
    pos = jnp.floor(
        jax.random.uniform(k_pos, (batch_size,)) * max_pos.astype(jnp.float32)
    ).astype(jnp.int32)
    base = jnp.take(dc.doc_offsets, docs) + pos
    gather_idx = base[:, None] + jnp.arange(dc.window_size, dtype=jnp.int32)
    features = jnp.take(dc.tokens, gather_idx)
    if dc.term_weights is not None:
        feature_weights = jnp.take(dc.term_weights, features)
    else:
        feature_weights = jnp.ones_like(features, jnp.float32)
    return TextEntityBatch(
        features=features,
        feature_weights=feature_weights,
        labels=docs,
        weights=jnp.take(dc.inv_doc_weight, docs),
    )


def make_device_sampled_sharded_multistep(
    desc,
    cfg,
    dc: DeviceCorpus,
    num_steps: int,
    mesh,
    params,
    opt_state,
    num_entities: Optional[int] = None,
):
    """Mesh x on-device-sampling composition: K sharded steps per compiled
    call, each sampling its own batch from the (replicated) device corpus;
    sampled batches are sharding-constrained over the data axis so GSPMD
    partitions the step exactly like the host-fed sharded path."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cunvsm_tpu.parallel.mesh import (
        DATA_AXIS,
        opt_state_shardings,
        param_shardings,
        shard_tree,
    )
    from cunvsm_tpu.train.step import make_train_step

    p_sh = param_shardings(mesh, params)
    o_sh = opt_state_shardings(mesh, opt_state, params.num_entities)
    repl = NamedSharding(mesh, P())
    step = make_train_step(desc, cfg, jit=False, num_entities=num_entities)

    def constrain(batch):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x,
                NamedSharding(
                    mesh, P(DATA_AXIS, *([None] * (x.ndim - 1)))
                ),
            ),
            batch,
        )

    def multistep(params, opt_state, key):
        keys = jax.random.split(key, num_steps)

        def body(carry, k):
            p, o = carry
            k_batch, k_step = jax.random.split(k)
            batch = constrain(sample_batch(dc, k_batch, cfg.batch_size))
            p, o, cost = step(p, o, batch, k_step)
            return (p, o), cost

        (params, opt_state), costs = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, costs

    sharded = jax.jit(
        multistep,
        in_shardings=(p_sh, o_sh, repl),
        out_shardings=(p_sh, o_sh, repl),
        donate_argnums=(0, 1),
    )
    return sharded, shard_tree(params, p_sh), shard_tree(opt_state, o_sh)


def make_device_sampled_multistep(
    desc,
    cfg,
    dc: DeviceCorpus,
    num_steps: int,
    num_entities: Optional[int] = None,
):
    """K training steps per compiled call, each sampling its own batch from
    the device-resident corpus.  step(params, opt_state, key) ->
    (params, opt_state, costs[K]).  The host's only per-call work is one
    PRNG key."""
    from cunvsm_tpu.train.step import make_train_step

    step = make_train_step(
        desc, cfg, jit=False, num_entities=num_entities
    )

    def multistep(params, opt_state, key):
        keys = jax.random.split(key, num_steps)

        def body(carry, k):
            p, o = carry
            k_batch, k_step = jax.random.split(k)
            batch = sample_batch(dc, k_batch, cfg.batch_size)
            p, o, cost = step(p, o, batch, k_step)
            return (p, o), cost

        (params, opt_state), costs = jax.lax.scan(
            body, (params, opt_state), keys
        )
        return params, opt_state, costs

    return jax.jit(multistep, donate_argnums=(0, 1))
