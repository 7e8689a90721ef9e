"""Run fusion: QLM + NVSM ensembles (py/combine_runs.py rebuild).

Semantics replicated from the reference:

* per-query score normalization: standardize / minmax / none
  (combine_runs.py:37-70);
* combined score of a document = the *mean* of the weighted normalized
  scores across the runs that retrieved it (combine_runs.py:15-34 — note:
  a document present in only one run is averaged over one element);
* supervised mode: k-fold cross-validation over queries, grid-searching
  alpha in [0, 1) per fold on the train split and applying the fold-best
  alpha to the test split (combine_runs.py:135-178);
* unsupervised mode: fixed alpha over the union of query ids
  (combine_runs.py:179-188).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from cunvsm_tpu.io.trec import Qrels, Run
from cunvsm_tpu.query.metrics import average_precision


def _standardize(scores: np.ndarray) -> Callable[[float], float]:
    mean, std = float(np.mean(scores)), float(np.std(scores))
    return lambda s: (s - mean) / std if std else 0.0


def _minmax(scores: np.ndarray) -> Callable[[float], float]:
    lo, hi = float(np.min(scores)), float(np.max(scores))
    return lambda s: (s - lo) / (hi - lo) if hi > lo else 0.0


def _identity(scores: np.ndarray) -> Callable[[float], float]:
    return lambda s: s


SCORE_NORMALIZERS = {
    "standardize": _standardize,
    "minmax": _minmax,
    "none": _identity,
}


def compute_combined_run(
    runs: Sequence[Run],
    weights: Sequence[float],
    query_ids: Sequence[str],
    normalizer: str = "standardize",
) -> Run:
    norm_factory = SCORE_NORMALIZERS[normalizer]
    combined: Run = {}
    for qid in query_ids:
        scores_per_doc: Dict[str, List[float]] = {}
        for run, weight in zip(runs, weights):
            ranking = dict(run.get(qid, []))
            if not ranking:
                continue
            norm = norm_factory(np.asarray(list(ranking.values())))
            for docno, score in ranking.items():
                scores_per_doc.setdefault(docno, []).append(
                    weight * norm(score)
                )
        combined[qid] = sorted(
            (
                (docno, float(np.mean(vals)))
                for docno, vals in scores_per_doc.items()
            ),
            key=lambda x: -x[1],
        )
    return combined


def fuse_fixed_alpha(
    run_a: Run, run_b: Run, alpha: float, normalizer: str = "standardize"
) -> Run:
    """Unsupervised fusion: combined = mean(alpha*norm(a), (1-alpha)*norm(b))."""
    query_ids = sorted(set(run_a) | set(run_b))
    return compute_combined_run(
        [run_a, run_b], [alpha, 1.0 - alpha], query_ids, normalizer
    )


def fuse_cross_validated(
    run_a: Run,
    run_b: Run,
    qrels: Qrels,
    num_folds: int = 20,
    alpha_stepsize: float = 0.05,
    normalizer: str = "standardize",
    seed: int = 0,
) -> Run:
    """Supervised fusion: per-fold grid search of alpha on MAP."""
    rng = np.random.RandomState(seed)
    query_ids = list(qrels.keys())
    rng.shuffle(query_ids)
    num_folds = min(num_folds, len(query_ids))
    folds = np.array_split(np.arange(len(query_ids)), num_folds)

    def mean_ap(run: Run, qids: Sequence[str]) -> float:
        vals = [
            average_precision(run.get(q, []), qrels[q])
            for q in qids
            if q in qrels
        ]
        vals = [v for v in vals if v is not None]
        return sum(vals) / len(vals) if vals else 0.0

    out: Run = {}
    for fold_idx, test_idx in enumerate(folds):
        test_set = set(int(i) for i in test_idx)
        train_qids = [
            q for i, q in enumerate(query_ids) if i not in test_set
        ]
        test_qids = [q for i, q in enumerate(query_ids) if i in test_set]

        best = (-math.inf, 0.0)
        for alpha in np.arange(0.0, 1.0, alpha_stepsize):
            combined = compute_combined_run(
                [run_a, run_b], [alpha, 1.0 - alpha], train_qids, normalizer
            )
            best = max(best, (mean_ap(combined, train_qids), float(alpha)))

        _, best_alpha = best
        test_combined = compute_combined_run(
            [run_a, run_b],
            [best_alpha, 1.0 - best_alpha],
            test_qids,
            normalizer,
        )
        out.update(test_combined)
    return out
