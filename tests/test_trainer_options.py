"""Trainer auxiliary-option tests: gradient-check flow, logging, guards."""

import logging

import numpy as np
import pytest

from cunvsm_tpu.config import DataConfig, ModelDesc, TrainConfig
from cunvsm_tpu.data.corpus import build_corpus
from cunvsm_tpu.train.trainer import train_model


def small_corpus():
    docs = [
        (f"d{i}", " ".join(
            f"w{j}" for j in np.random.RandomState(i).randint(0, 12, 10)))
        for i in range(4)
    ]
    return build_corpus(
        docs,
        DataConfig(max_vocabulary_size=0, min_document_frequency=0,
                   max_document_frequency=0),
        window_size=3,
    )


def small_cfg(**kw):
    base = dict(
        num_epochs=1, batch_size=4, window_size=3, num_random_entities=2,
        learning_rate=0.01,
    )
    base.update(kw)
    return TrainConfig(**base)


def test_check_gradients_flow():
    """The --check_gradients training path verifies every batch's gradients
    before updating (main.cu:414-425 parity); float64 via the x64-enabled
    test env."""
    import jax.numpy as jnp

    corpus = small_corpus()
    desc = ModelDesc(word_repr_size=4, entity_repr_size=4)
    r = train_model(
        desc, small_cfg(), corpus, check_gradients=True, dtype=jnp.float64
    )
    assert np.isfinite(r.epoch_costs[0])


def test_log_every(caplog):
    corpus = small_corpus()
    desc = ModelDesc(word_repr_size=4, entity_repr_size=4)
    with caplog.at_level(logging.INFO, logger="cunvsm_tpu.train.trainer"):
        train_model(desc, small_cfg(), corpus, log_every=1)
    assert any("progress=" in m for m in caplog.messages)


def test_compute_initial_cost(caplog):
    corpus = small_corpus()
    desc = ModelDesc(word_repr_size=4, entity_repr_size=4)
    with caplog.at_level(logging.INFO, logger="cunvsm_tpu.train.trainer"):
        train_model(desc, small_cfg(), corpus, compute_initial_cost=True)
    assert any("Initial cost" in m for m in caplog.messages)


def test_incompatible_option_guards():
    corpus = small_corpus()
    desc = ModelDesc(word_repr_size=4, entity_repr_size=4)
    with pytest.raises(ValueError, match="steps_per_call"):
        train_model(
            desc, small_cfg(), corpus,
            check_gradients=True, steps_per_call=2,
        )
    with pytest.raises(ValueError, match="stochastic-only"):
        train_model(
            desc, small_cfg(no_shuffle=True), corpus,
            on_device_sampling=True,
        )
    with pytest.raises(ValueError, match="incompatible"):
        train_model(
            desc, small_cfg(), corpus,
            on_device_sampling=True, check_gradients=True,
        )


def test_on_device_steps_per_call_auto_adjusts(caplog):
    """A steps_per_call that does not divide the epoch's step count is
    auto-adjusted down to the largest divisor (with a warning) so no
    remainder steps are silently dropped — the reference trains every
    instance each epoch (data_indri.cpp:224-410)."""
    corpus = small_corpus()
    desc = ModelDesc(word_repr_size=4, entity_repr_size=4)
    cfg = small_cfg(num_epochs=2)
    # 4 docs x ceil(10-3+1)=8 instances, batch 4 -> 8 steps/epoch; K=7
    # does not divide, largest divisor <= 7 is 4.
    with caplog.at_level(logging.INFO, logger="cunvsm_tpu.train.trainer"):
        r = train_model(
            desc, cfg, corpus, on_device_sampling=True, steps_per_call=7
        )
    assert any(
        "auto-adjusted to 4" in m for m in caplog.messages
    ), caplog.messages
    # Every epoch still trains the FULL 8 steps (2 calls of 4).
    assert sum("(8 steps" in m for m in caplog.messages) == 2
    assert np.isfinite(r.epoch_costs[-1])
