"""Sharded query serving: doc-score matmul + distributed top-k merge.

The serving analog of the training-side entity sharding (SURVEY.md §2.4,
§3.4): the L2-normalized document matrix is sharded row-wise over the
``model`` axis, every device scores its shard of documents against the
(replicated) projected queries and takes a local top-k, and the global
ranking is the top-k of the gathered per-shard candidates — k' = k local
candidates per shard always contain the global top-k.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cunvsm_tpu.parallel.mesh import MODEL_AXIS


def make_sharded_scorer(mesh: Mesh, entity_norm: jax.Array, top_k: int):
    """Build a jit'd scorer over a row-sharded normalized document matrix.

    Returns (scorer, sharded_entity_matrix); scorer(projected_queries) ->
    (scores [Q, k], doc_indices [Q, k]) with global document indices.
    """
    num_docs = entity_norm.shape[0]
    k = min(top_k, num_docs)
    e_sh = NamedSharding(mesh, P(MODEL_AXIS, None))
    entity_sharded = jax.device_put(entity_norm, e_sh)
    repl = NamedSharding(mesh, P())

    @partial(jax.jit, out_shardings=(repl, repl))
    def scorer(q_norm: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # GSPMD keeps the matmul sharded on the document axis, takes the
        # top-k per shard, then all-gathers only the k candidates per shard
        # for the final merge — never the full score matrix.
        scores = jnp.dot(
            q_norm, entity_sharded.T, preferred_element_type=jnp.float32
        )  # [Q, D] sharded on D
        values, indices = jax.lax.top_k(scores, k)
        return values, indices

    return scorer, entity_sharded
