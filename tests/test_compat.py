"""Tests for the py/nvsm-compatible API shim."""

import numpy as np
import pytest

from cunvsm_tpu.compat import nvsm
from cunvsm_tpu.config import DataConfig, ModelDesc, TrainConfig
from cunvsm_tpu.data.corpus import build_corpus
from cunvsm_tpu.train.trainer import train_model


@pytest.fixture(scope="module")
def model_prefix(tmp_path_factory):
    rng = np.random.RandomState(0)
    topics = {
        "space": "rocket orbit launch satellite astronaut".split(),
        "food": "recipe oven flour butter bake".split(),
    }
    docs = []
    for t, words in topics.items():
        for i in range(5):
            body = " ".join(words[rng.randint(len(words))] for _ in range(20))
            docs.append((f"{t}_{i}", body))
    corpus = build_corpus(
        docs,
        DataConfig(max_vocabulary_size=0, min_document_frequency=0,
                   max_document_frequency=0),
        window_size=4,
    )
    desc = ModelDesc(word_repr_size=16, entity_repr_size=12)
    cfg = TrainConfig(
        num_epochs=10, batch_size=16, window_size=4, num_random_entities=3,
        learning_rate=0.01, seed=1,
    )
    prefix = str(tmp_path_factory.mktemp("compat") / "m")
    train_model(desc, cfg, corpus, output_prefix=prefix)
    return prefix, corpus


def test_load_and_attributes(model_prefix):
    prefix, corpus = model_prefix
    meta = nvsm.load_meta(prefix)
    model = nvsm.load_model(meta, prefix, 10)
    assert model.num_terms == corpus.vocab.size
    assert model.num_objects == corpus.num_docs
    assert model.word_representations.shape == (corpus.vocab.size, 16)
    assert model.transform_matrix.shape == (16, 12)
    assert "NVSM" in repr(model)
    assert nvsm.LSE is nvsm.NVSM


def test_query_representation_and_infer(model_prefix):
    prefix, corpus = model_prefix
    meta = nvsm.load_meta(prefix)
    model = nvsm.load_model(meta, prefix, 10)
    # Address terms by index term id, like pyndri-based callers do.
    rocket_model_id = corpus.vocab.term_to_id["rocket"]
    rocket_index_id = int(corpus.vocab.index_term_ids[rocket_model_id])
    r = model.query_representation([rocket_index_id])
    np.testing.assert_allclose(
        r, model.word_representations[rocket_model_id], rtol=1e-6
    )
    proj = model.infer(r)
    assert proj.shape == (12,)
    assert model.query_representation([999999]) is None


def test_query_ranks_topically(model_prefix):
    prefix, corpus = model_prefix
    meta = nvsm.load_meta(prefix)
    model = nvsm.load_model(meta, prefix, 10, nonlinearity="tanh")
    t2i = corpus.vocab.term_to_id
    iids = [
        int(corpus.vocab.index_term_ids[t2i[t]]) for t in ("rocket", "orbit")
    ]
    ranked = model.query(iids, top_k=5)
    assert len(ranked) == 5
    # Top document is a space doc: map index_object_id -> docno.
    top_obj = ranked[0][0]
    model_doc = model.inv_object_mapping[top_obj]
    assert corpus.docnos[model_doc].startswith("space")


def test_related_terms_and_similarity(model_prefix):
    prefix, corpus = model_prefix
    meta = nvsm.load_meta(prefix)
    model = nvsm.load_model(meta, prefix, 10)
    t2i = corpus.vocab.term_to_id
    iid = int(corpus.vocab.index_term_ids[t2i["rocket"]])
    rel = model.related_terms(iid, k=3)
    assert len(rel) == 3
    sim = model.term_similarity(
        iid, int(corpus.vocab.index_term_ids[t2i["orbit"]])
    )
    assert -1.0 <= sim <= 1.0
