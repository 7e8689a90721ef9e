"""End-to-end pipeline-script tests on synthetic collections."""

import json
import os
import random
import sys

import pytest

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")
sys.path.insert(0, SCRIPTS)


@pytest.fixture
def adhoc_collection(tmp_path):
    """Structured synthetic TREC setup: 12 topics, each owning 5 documents
    salted with its query words."""
    random.seed(0)
    vocab = [f"w{i}" for i in range(300)]
    with open(tmp_path / "corpus.trectext", "w") as f:
        for i in range(60):
            topic_words = [vocab[(i % 12) * 20 + j] for j in range(8)]
            body = " ".join(random.choices(vocab, k=40) + topic_words * 6)
            f.write(
                f"<DOC>\n<DOCNO>d{i}</DOCNO>\n<TEXT>\n{body}\n</TEXT>\n</DOC>\n"
            )
    with open(tmp_path / "topics.txt", "w") as f:
        for q in range(12):
            words = " ".join(vocab[q * 20 + j] for j in range(4))
            f.write(f"{q + 1} {words}\n")
    with open(tmp_path / "qrels.txt", "w") as f:
        for q in range(12):
            for i in range(60):
                if i % 12 == q:
                    f.write(f"{q + 1} 0 d{i} 1\n")
    os.makedirs(tmp_path / "splits", exist_ok=True)
    (tmp_path / "splits" / "validation").write_text(
        "\n".join(str(q + 1) for q in range(6)) + "\n"
    )
    (tmp_path / "splits" / "test").write_text(
        "\n".join(str(q + 1) for q in range(6, 12)) + "\n"
    )
    return tmp_path


def test_rank_adhoc_protocol(adhoc_collection, tmp_path):
    """The Robust04-style protocol end to end: train -> per-epoch
    validation -> best-epoch selection -> test MAP + fusion."""
    import rank_adhoc

    workdir = tmp_path / "out"
    rc = rank_adhoc.main([
        "--corpus", str(adhoc_collection / "corpus.trectext"),
        "--topics", str(adhoc_collection / "topics.txt"),
        "--qrels", str(adhoc_collection / "qrels.txt"),
        "--splits", str(adhoc_collection / "splits"),
        "--workdir", str(workdir),
        "--num_epochs", "4", "--eval_every", "2",
        "--word_repr_size", "16", "--entity_repr_size", "16",
        "--batch_size", "256",
    ])
    assert rc in (0, None)
    results = json.load(open(workdir / "results.json"))
    # The lexical ranker must solve this synthetic task outright, and the
    # trained model must add real signal over random (random MAP ~0.08).
    assert results["qlm_jm_prf_test_map"] > 0.95
    assert results["nvsm_test_map"] > 0.3
    assert results["best_epoch"] in (2, 4)
