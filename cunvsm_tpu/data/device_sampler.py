"""On-device instance sampling: the fully TPU-native data path.

The host pipeline (instances.py) replicates the reference's epoch semantics
exactly but ships every batch over host->device transfer.  For stochastic
training (the canonical NVSM/LSE configuration) the sampling itself is just
"uniform document, uniform window position" — expressible in jax — so the
packed token array can live in HBM and the *training step samples its own
batch* inside the same compiled program.  The host sends nothing per step
but a PRNG key.

Two sampling modes:

* **epoch-exact** (default): reproduces the reference's
  StochasticInstanceGenerator semantics (data_indri.cpp:224-410) — every
  eligible document contributes exactly ceil(avg_len - w + 1) instances per
  epoch, globally shuffled.  The per-epoch document-pointer permutation is
  regenerated *on device* (one jitted permutation per epoch, carried across
  multi-step calls by a cursor); window positions are uniform per draw, as
  in the reference (data_indri.cpp:300-322 draws them fresh at each reset).
* **i.i.d.** (``epoch_exact=False``): documents drawn uniformly per batch —
  identical in expectation, without the per-epoch count guarantee; no
  per-epoch permutation state.

Weighting strategies are supported on device (UNIFORM -> 1;
INV_DOC_FREQUENCY -> avg_len/len; self-information feature weights via a
device table).
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
    # None under UNIFORM weighting (all ones — skipping the gather saves a
    # [B]-row per-row-rate-bound take per step).
    inv_doc_weight: Optional[jax.Array]  # [num_docs] float32 or None
    term_weights: Optional[jax.Array]  # [vocab] float32 or None
    window_size: int
    # (offset, length) packed per doc: ONE [B]-row gather per batch
    # instead of two (the gather emitter is per-row-rate-bound, so the
    # 2-wide row costs the same as a 1-wide one).
    doc_meta: Optional[jax.Array] = None  # [num_docs, 2] int32
    # Overlapped wide-row view of ``tokens``: row r = tokens[rG : rG+2G]
    # (G = WIDE_ROW_STRIDE), so any W <= G+1 window lives inside ONE row.
    # The gather emitter on this toolchain is per-ROW-rate-bound
    # (~14-20 ns/row regardless of row width), so fetching a [B, W]
    # window batch as B wide rows + an in-register shift costs ~W times
    # less than the B*W single-token gathers it replaces, for 2x token
    # memory.  None when window_size > G+1.
    tokens_wide: Optional[jax.Array] = None  # [ceil(N/G)+1, 2G] u16/int32
    # Same overlapped view of the per-token SELF_INFORMATION weights
    # (term_weights[tokens] precomputed host-side): the feature-weight
    # fetch rides the same one-row-per-instance gather + shift-selects
    # instead of a B*W per-element take.  None under UNIFORM weighting.
    term_weights_wide: Optional[jax.Array] = None  # [ceil(N/G)+1, 2G] f32


# Wide-row stride (G).  2G = 32 int32 per row; windows up to G+1 = 17
# tokens (the canonical configuration uses 10) resolve inside one row.
WIDE_ROW_STRIDE = 16


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
        inv = jnp.asarray((avg / np.maximum(lengths, 1)).astype(np.float32))
    else:
        inv = None  # uniform: weights are all ones, no per-batch gather
    term_weights = None
    if feature_weighting == FeatureWeighting.SELF_INFORMATION:
        term_weights = jnp.asarray(
            corpus.vocab.self_information().astype(np.float32)
        )
    tokens_wide = None
    term_weights_wide = None
    if w <= WIDE_ROW_STRIDE + 1:
        g = WIDE_ROW_STRIDE
        n = len(corpus.tokens)
        num_rows = -(-n // g) + 1

        def overlapped(flat, dt):
            padded = np.zeros(num_rows * g + g, dtype=dt)
            padded[:n] = flat
            wide = np.lib.stride_tricks.as_strided(
                padded,
                shape=(num_rows, 2 * g),
                strides=(g * padded.itemsize, padded.itemsize),
            )
            return jnp.asarray(np.ascontiguousarray(wide))

        # Word ids < 65536 fit uint16: half the gathered bytes per row
        # (the canonical vocabulary is capped at exactly 65536).
        tokens_wide = overlapped(
            corpus.tokens,
            np.uint16 if corpus.vocab.size <= 65536 else np.int32,
        )
        if term_weights is not None:
            term_weights_wide = overlapped(
                np.asarray(term_weights)[corpus.tokens], np.float32
            )
    return DeviceCorpus(
        tokens=jnp.asarray(corpus.tokens, jnp.int32),
        doc_offsets=jnp.asarray(corpus.doc_offsets[:-1], jnp.int32),
        doc_lengths=jnp.asarray(lengths),
        eligible=jnp.asarray(eligible),
        inv_doc_weight=inv,
        term_weights=term_weights,
        window_size=w,
        tokens_wide=tokens_wide,
        term_weights_wide=term_weights_wide,
        doc_meta=jnp.asarray(
            np.stack(
                [corpus.doc_offsets[:-1].astype(np.int32), lengths], axis=1
            )
        ),
    )


def epoch_doc_pointers(dc: DeviceCorpus) -> jax.Array:
    """The per-epoch instance multiset: every eligible document repeated
    samples_per_doc = max(ceil(avg_invocab_len - w + 1), 1) times
    (data_indri.cpp:337-344 — the count is the same for every document)."""
    import math

    lengths = np.asarray(dc.doc_lengths)[np.asarray(dc.eligible)]
    avg = float(lengths.mean()) if len(lengths) else 0.0
    samples_per_doc = max(int(math.ceil(avg - dc.window_size + 1)), 1)
    return jnp.asarray(
        np.repeat(np.asarray(dc.eligible), samples_per_doc), jnp.int32
    )


def _perm_slice(doc_perm: jax.Array, cursor, batch_size: int) -> jax.Array:
    """Next batch_size pointers from the shuffled epoch array, wrapping
    modularly (only reachable on corpora smaller than one batch)."""
    idx = (cursor + jnp.arange(batch_size, dtype=jnp.int32)) % doc_perm.shape[0]
    return jnp.take(doc_perm, idx)


def sample_batch(
    dc: DeviceCorpus,
    key: jax.Array,
    batch_size: int,
    docs: Optional[jax.Array] = None,
) -> TextEntityBatch:
    """Sample one training batch on device (jit-compatible).

    ``docs`` overrides document selection (the epoch-exact path feeds a
    slice of the shuffled per-epoch pointer array); positions are always
    uniform per draw.
    """
    k_doc, k_pos = jax.random.split(key)
    if docs is None:
        eligible_idx = jax.random.randint(
            k_doc, (batch_size,), 0, dc.eligible.shape[0]
        )
        docs = jnp.take(dc.eligible, eligible_idx)
    if dc.doc_meta is not None:
        meta = jnp.take(dc.doc_meta, docs, axis=0)  # [B, 2] (offset, len)
        offsets, lengths = meta[:, 0], meta[:, 1]
    else:
        offsets = jnp.take(dc.doc_offsets, docs)
        lengths = jnp.take(dc.doc_lengths, docs)
    max_pos = lengths - dc.window_size + 1
    # floor(u * n) with the maximal f32 u < 1 can round UP to exactly n
    # (the product lands half an ulp below n and ties-to-even) — clamp,
    # or ~2^-24 of draws sample a window one token past the doc end.
    pos = jnp.minimum(
        jnp.floor(
            jax.random.uniform(k_pos, (batch_size,))
            * max_pos.astype(jnp.float32)
        ).astype(jnp.int32),
        max_pos - 1,
    )
    base = offsets + pos
    feature_weights = None
    if dc.tokens_wide is not None:
        # Wide-row fetch: the gather emitter is per-ROW-rate-bound, so
        # fetch each instance's window as ONE row of the overlapped
        # [.., 2G] token view (B rows instead of B*W), then align the
        # window to the row head with log2(G) constant-shift selects —
        # pure elementwise ops that fuse, no per-element gather.
        g = WIDE_ROW_STRIDE
        row = base // g
        off = base - row * g

        def align(rows):
            bit = g // 2
            while bit:
                take_hi = (off & bit).astype(bool)[:, None]
                rows = jnp.where(
                    take_hi, rows[:, bit:], rows[:, : rows.shape[1] - bit]
                )
                bit //= 2
            return rows[:, : dc.window_size]

        features = align(
            jnp.take(dc.tokens_wide, row, axis=0)
        ).astype(jnp.int32)
        if dc.term_weights_wide is not None:
            # SELF_INFORMATION weights ride the same row fetch.
            feature_weights = align(
                jnp.take(dc.term_weights_wide, row, axis=0)
            )
    else:
        # Fallback for windows wider than one row: W independent [B]-row
        # 1-D gathers (this toolchain's gather emitter handles a [B,W]
        # 2-D-index take poorly — 8.6 vs 1.4 ms microbenched at the
        # canonical 51200x10 batch).
        features = jnp.stack(
            [jnp.take(dc.tokens, base + j) for j in range(dc.window_size)],
            axis=1,
        )
    if feature_weights is None:
        if dc.term_weights is not None:
            feature_weights = jnp.take(dc.term_weights, features)
        else:
            feature_weights = jnp.ones_like(features, jnp.float32)
    if dc.inv_doc_weight is not None:
        weights = jnp.take(dc.inv_doc_weight, docs)
    else:
        weights = jnp.ones((batch_size,), jnp.float32)
    return TextEntityBatch(
        features=features,
        feature_weights=feature_weights,
        labels=docs,
        weights=weights,
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
    epoch_exact: bool = True,
):
    """Mesh x on-device-sampling composition: K sharded steps per compiled
    call, each sampling its own batch from the (replicated) device corpus;
    sampled batches are sharding-constrained over the data axis so GSPMD
    partitions the step exactly like the host-fed sharded path.  With
    ``epoch_exact`` the runner takes the replicated shuffled pointer array
    and a cursor (see make_device_sampled_multistep)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from cunvsm_tpu.parallel.mesh import (
        DATA_AXIS,
        opt_state_shardings,
        param_shardings,
        shard_tree,
    )
    from cunvsm_tpu.train.step import make_train_step

    # The shard_mapped word accumulation (optim.updates.
    # _data_sharded_accumulate) splits the update stream over EVERY mesh
    # axis; validate the divisibility up front with a clear message (the
    # same check trainer.py applies to the host-fed path).
    n_devices = int(np.prod(list(mesh.shape.values())))
    if cfg.batch_size % n_devices:
        raise ValueError(
            f"batch_size {cfg.batch_size} not divisible by the total "
            f"device count {n_devices} (mesh {dict(mesh.shape)}): the "
            f"sharded word accumulation splits the update stream over "
            f"every mesh axis"
        )

    p_sh = param_shardings(mesh, params)
    o_sh = opt_state_shardings(mesh, opt_state, params.num_entities)
    repl = NamedSharding(mesh, P())
    # mesh= engages the shard_mapped word-gradient accumulation.  Without
    # it GSPMD hits its replicate-on-unpartitionable fallback on the
    # accumulation sort and all-reduces the FULL B*W word update stream
    # (~614 MB/step at canonical shapes) — asserted against in
    # tests/test_sharding.py::test_device_sampled_sharded_comm_volume.
    step = make_train_step(
        desc, cfg, jit=False, num_entities=num_entities, mesh=mesh
    )

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

    if epoch_exact:

        def multistep(params, opt_state, key, doc_perm, start):
            keys = jax.random.split(key, num_steps)

            def body(carry, k):
                p, o, cursor = carry
                k_batch, k_step = jax.random.split(k)
                docs = _perm_slice(doc_perm, cursor, cfg.batch_size)
                batch = constrain(
                    sample_batch(dc, k_batch, cfg.batch_size, docs=docs)
                )
                p, o, cost = step(p, o, batch, k_step)
                return (p, o, cursor + cfg.batch_size), cost

            (params, opt_state, _), costs = jax.lax.scan(
                body,
                (params, opt_state, jnp.asarray(start, jnp.int32)),
                keys,
            )
            return params, opt_state, costs

        sharded = jax.jit(
            multistep,
            in_shardings=(p_sh, o_sh, repl, repl, repl),
            out_shardings=(p_sh, o_sh, repl),
            donate_argnums=(0, 1),
        )
    else:

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
    epoch_exact: bool = True,
):
    """K training steps per compiled call, each sampling its own batch from
    the device-resident corpus.  The host's only per-call work is a PRNG
    key (plus, in epoch-exact mode, the shuffled pointer array and cursor).

    Returns the jitted runner:
      epoch-exact: step(params, opt_state, key, doc_perm, start)
      i.i.d.:      step(params, opt_state, key)
    both -> (params, opt_state, costs[K]).  Pair the exact runner with
    ``make_epoch_permuter`` — the trainer regenerates the permutation once
    per epoch on device and advances ``start`` by K * batch_size per call.
    """
    from cunvsm_tpu.train.step import make_train_step

    step = make_train_step(
        desc, cfg, jit=False, num_entities=num_entities
    )

    if epoch_exact:

        def multistep(params, opt_state, key, doc_perm, start):
            keys = jax.random.split(key, num_steps)

            def body(carry, inputs):
                p, o, cursor = carry
                k = inputs
                k_batch, k_step = jax.random.split(k)
                docs = _perm_slice(doc_perm, cursor, cfg.batch_size)
                batch = sample_batch(dc, k_batch, cfg.batch_size, docs=docs)
                p, o, cost = step(p, o, batch, k_step)
                return (p, o, cursor + cfg.batch_size), cost

            (params, opt_state, _), costs = jax.lax.scan(
                body, (params, opt_state, jnp.asarray(start, jnp.int32)), keys
            )
            return params, opt_state, costs

        return jax.jit(multistep, donate_argnums=(0, 1))

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


def make_epoch_permuter(dc: DeviceCorpus):
    """(jitted permute_fn, pointers_per_epoch): permute_fn(key) shuffles the
    per-epoch document-pointer array on device (the DataSource::reset
    reshuffle, data_indri.cpp:328-398)."""
    doc_ptrs = epoch_doc_pointers(dc)
    permute = jax.jit(lambda k: jax.random.permutation(k, doc_ptrs))
    return permute, int(doc_ptrs.shape[0])
