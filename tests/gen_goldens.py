"""Generate tests/golden/queries.json — the reference query set goldens
(FIXTURES.md §1.2) from the sf0.001 corpus via the independent brute-force
scorer. Deterministic: fixture data is seed-fixed, scorer is pure.

Run: python tests/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tests.golden_scorer import BruteForceBM25  # noqa: E402

SF_DIR = os.environ.get("GOLDEN_SF_DIR", "/root/testdata/sf0.001")
P = 8  # must match the IndexConfig.n_build_partitions used in tests

QUERIES = [
    "spark",
    "join",
    "vector",
    "the",
    "a",
    "customer",
    "spark join",
    "window agg",
    "sort merge",
    "the data",
    "vector the",
    "fast slow",
    "hash group",
    "big table",
    "stream batch",
    "sort merge join",
    "big data table",
    "scan filter sort",
    "group order sort window",
    "the a",
    "the the data",
    "query query plan",
    "zzz",
    "spark zzz",
    # cold-term coverage (df < hot_threshold ⇒ salt 0, one block spanning
    # every doc-range shard): regression for the WAND shard-clipping bug
    "dup",
    "dup the",
    "dup vector",
]


def load_corpus(sf_dir: str) -> list[tuple[str, str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet").to_pydict()
    # FIXTURES.md §1.1 url mapping, replicated independently
    return [
        (f"https://{src}.example.com/doc/{did}", text)
        for did, src, text in zip(t["doc_id"], t["source"], t["text"])
    ]


def main() -> None:
    corpus = load_corpus(SF_DIR)
    scorer = BruteForceBM25(corpus, P=P)
    out = {
        "sf_dir": SF_DIR,
        "P": P,
        "k1": scorer.k1,
        "b": scorer.b,
        "n_docs": scorer.N,
        "avgdl": scorer.avgdl,
        "queries": [
            {
                "query": q,
                "top": [[int(d), round(float(s), 10)] for d, s in scorer.topk(q, 10)],
                "top_conj": [
                    [int(d), round(float(s), 10)]
                    for d, s in scorer.topk(q, 10, conjunctive=True)
                ],
            }
            for q in QUERIES
        ],
    }
    path = os.path.join(os.path.dirname(__file__), "golden", "queries.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}: {len(QUERIES)} queries over {scorer.N} docs")


if __name__ == "__main__":
    main()
