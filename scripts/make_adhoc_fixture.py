#!/usr/bin/env python
"""Synthesize a Robust04-shaped evaluation fixture: a MULTI-INDEX Indri
repository (the unmerged incremental-build shape the reference LOG(FATAL)s
on, data_indri.cpp:43-45) plus TREC topics, qrels, and validation/test
splits — for rehearsing the full scripts/rank_adhoc.py protocol at
collection scale before real TREC data is available.

Corpus model (same family as scripts/collection_scale_study.py): T topics
over a Zipf vocabulary; each document draws ~70% of its tokens from its
topic's head words and 30% from the global background.  Query terms come
from mid-frequency head ranks so they survive the max_document_frequency
filter; relevance = every document of the query's topic.

    python scripts/make_adhoc_fixture.py --root /tmp/adhoc \
        --num_docs 524288 --num_indexes 4
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

VOCAB = 65536
DOC_LEN = 120
TOPIC_HEAD = 60
TOPIC_FRACTION = 0.7
QUERY_TERMS = 4
# Query words from head ranks [10, 60): frequent enough to anchor the
# topic, rare enough to survive a 0.5 max-document-frequency filter.
QUERY_RANK_LO = 10


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", required=True)
    p.add_argument("--num_docs", type=int, default=524288)
    p.add_argument("--num_indexes", type=int, default=4)
    p.add_argument("--num_topics", type=int, default=512)
    p.add_argument("--num_queries", type=int, default=512)
    p.add_argument("--validation_fraction", type=float, default=0.25)
    p.add_argument("--gen_seed", type=int, default=12345)
    args = p.parse_args(argv)

    from tests.indri_fixture import write_repository

    t0 = time.time()
    rng = np.random.RandomState(args.gen_seed)
    bg_p = 1.0 / np.arange(1, VOCAB + 1) ** 1.07
    bg_p /= bg_p.sum()
    heads = np.stack([
        rng.choice(VOCAB, TOPIC_HEAD, replace=False, p=bg_p)
        for _ in range(args.num_topics)
    ])
    head_p = 1.0 / np.arange(1, TOPIC_HEAD + 1) ** 0.9
    head_p /= head_p.sum()

    doc_topics = rng.randint(0, args.num_topics, args.num_docs)
    n_topic = int(DOC_LEN * TOPIC_FRACTION)
    n_bg = DOC_LEN - n_topic
    topic_slots = heads[doc_topics][
        np.arange(args.num_docs)[:, None],
        rng.choice(TOPIC_HEAD, (args.num_docs, n_topic), p=head_p),
    ]
    bg_slots = rng.choice(VOCAB, (args.num_docs, n_bg), p=bg_p)
    docs = np.concatenate([topic_slots, bg_slots], axis=1)
    perm = np.argsort(rng.rand(args.num_docs, DOC_LEN), axis=1)
    docs = np.take_along_axis(docs, perm, axis=1).astype(np.int32)
    print(f"[{time.time()-t0:.0f}s] corpus sampled "
          f"({args.num_docs} docs x {DOC_LEN}).", flush=True)

    # Token-id -> term string table (shared interned strings).
    ts = [f"t{i}" for i in range(VOCAB)]
    per_index = (args.num_docs + args.num_indexes - 1) // args.num_indexes
    doc_groups = []
    for gi in range(args.num_indexes):
        lo, hi = gi * per_index, min((gi + 1) * per_index, args.num_docs)
        doc_groups.append([
            (f"d{i}", [ts[w] for w in docs[i]]) for i in range(lo, hi)
        ])
    print(f"[{time.time()-t0:.0f}s] token strings built.", flush=True)

    repo = os.path.join(args.root, "repository")
    os.makedirs(args.root, exist_ok=True)
    write_repository(repo, doc_groups)
    print(f"[{time.time()-t0:.0f}s] multi-index repository written "
          f"({args.num_indexes} indexes).", flush=True)

    # Topics, qrels, splits.
    q_topics = rng.choice(args.num_topics, args.num_queries, replace=False) \
        if args.num_queries <= args.num_topics else \
        rng.randint(0, args.num_topics, args.num_queries)
    mid_p = head_p[QUERY_RANK_LO:].copy()
    mid_p /= mid_p.sum()
    with open(os.path.join(args.root, "topics.txt"), "w") as f:
        for qi in range(args.num_queries):
            ranks = QUERY_RANK_LO + rng.choice(
                TOPIC_HEAD - QUERY_RANK_LO, QUERY_TERMS, replace=False,
                p=mid_p,
            )
            words = " ".join(ts[w] for w in heads[q_topics[qi]][ranks])
            f.write(f"{qi} {words}\n")
    with open(os.path.join(args.root, "qrels.txt"), "w") as f:
        for qi in range(args.num_queries):
            for d in np.flatnonzero(doc_topics == q_topics[qi]):
                f.write(f"{qi} 0 d{d} 1\n")
    os.makedirs(os.path.join(args.root, "splits"), exist_ok=True)
    n_val = int(args.num_queries * args.validation_fraction)
    val_ids = set(
        rng.choice(args.num_queries, n_val, replace=False).tolist()
    )
    with open(os.path.join(args.root, "splits", "validation"), "w") as f:
        f.writelines(f"{q}\n" for q in sorted(val_ids))
    with open(os.path.join(args.root, "splits", "test"), "w") as f:
        f.writelines(
            f"{q}\n" for q in range(args.num_queries) if q not in val_ids
        )
    meta = {
        "num_docs": args.num_docs,
        "num_indexes": args.num_indexes,
        "num_topics": args.num_topics,
        "num_queries": args.num_queries,
        "validation": n_val,
        "gen_seed": args.gen_seed,
        "wall_clock_s": round(time.time() - t0, 1),
    }
    with open(os.path.join(args.root, "fixture.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(json.dumps(meta))
    return 0


if __name__ == "__main__":
    sys.exit(main())
