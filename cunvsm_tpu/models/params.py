"""Model parameters as a jax pytree.

Replaces the reference's parameter-class forest (Representations / Transform /
RepresentationsStorage / TransformStorage, params.cu + storage.cu) with one
immutable NamedTuple that jit/grad/shard transparently.

Array layouts (chosen to match the HDF5 checkpoint contract directly —
hdf5.cu:33 writes (cols, rows) so numpy/h5py sees objects-by-dims):

* ``word_reprs``:   [num_words,    word_dim]
* ``entity_reprs``: [num_entities, entity_dim]
* ``transform_w``:  [word_dim,     entity_dim]  (projection is x @ W + b)
* ``transform_b``:  [entity_dim]
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from cunvsm_tpu.config import ModelDesc


class ModelParams(NamedTuple):
    word_reprs: jax.Array
    entity_reprs: jax.Array
    transform_w: jax.Array
    transform_b: jax.Array

    @property
    def num_words(self) -> int:
        return self.word_reprs.shape[0]

    @property
    def num_entities(self) -> int:
        return self.entity_reprs.shape[0]

    @property
    def word_dim(self) -> int:
        return self.word_reprs.shape[1]

    @property
    def entity_dim(self) -> int:
        return self.entity_reprs.shape[1]


def glorot_uniform(key: jax.Array, rows: int, cols: int, dtype) -> jax.Array:
    """Glorot/Xavier uniform on [-sqrt(6/(rows+cols)), +sqrt(6/(rows+cols))].

    Same limits as the reference host-side init (cuda_utils.h:35-56); the
    random stream differs (threefry vs minstd_rand0), which only matters for
    bit-exact replay, not statistics.
    """
    limit = (6.0 / (rows + cols)) ** 0.5
    return jax.random.uniform(
        key, (rows, cols), dtype=dtype, minval=-limit, maxval=limit
    )


def init_params(
    key: jax.Array,
    num_words: int,
    num_entities: int,
    desc: ModelDesc,
    dtype=jnp.float32,
) -> ModelParams:
    """Glorot-init representations and transform; zero bias (params.cu:361-372)."""
    k_words, k_entities, k_transform = jax.random.split(key, 3)
    return ModelParams(
        word_reprs=glorot_uniform(
            k_words, num_words, desc.word_repr_size, dtype
        ),
        entity_reprs=glorot_uniform(
            k_entities, num_entities, desc.entity_repr_size, dtype
        ),
        transform_w=glorot_uniform(
            k_transform, desc.word_repr_size, desc.entity_repr_size, dtype
        ),
        transform_b=jnp.zeros((desc.entity_repr_size,), dtype=dtype),
    )
