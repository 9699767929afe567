"""Independent brute-force BM25 golden scorer (SURVEY.md §5.2).

Pure numpy/python — no Spark, no imports from engine/* — so the goldens it
produces are an independent check on the engine's pruned path. The *spec* it
implements is the same published one (SURVEY.md §2.B2/B13): ES-5.x standard
analyzer (lowercase + Unicode word segmentation) and Lucene BM25 with
k1=1.2, b=0.75; doc ids follow the engine's documented deterministic scheme
(bucket = crc32(url) % P, doc_id = rank_in_bucket * P + bucket).
"""

from __future__ import annotations

import re
import zlib
from collections import Counter, defaultdict

import numpy as np

WORD = re.compile(r"[^\W_]+", re.UNICODE)


def assign_ids(urls: list[str], P: int) -> dict[str, int]:
    buckets: dict[int, list[str]] = defaultdict(list)
    for u in urls:
        buckets[zlib.crc32(u.encode("utf-8")) % P].append(u)
    ids: dict[str, int] = {}
    for b, us in buckets.items():
        for rank, u in enumerate(sorted(us)):
            ids[u] = rank * P + b
    return ids


class BruteForceBM25:
    def __init__(self, corpus: list[tuple[str, str]], P: int = 8,
                 k1: float = 1.2, b: float = 0.75):
        """corpus: list of (url, text)."""
        self.k1, self.b = k1, b
        urls = [u for u, _ in corpus]
        self.ids = assign_ids(urls, P)
        self.tf: dict[str, dict[int, int]] = defaultdict(dict)
        self.dl: dict[int, int] = {}
        for url, text in corpus:
            did = self.ids[url]
            toks = WORD.findall(text.lower())
            self.dl[did] = len(toks)
            for t, c in Counter(toks).items():
                self.tf[t][did] = c
        self.N = len(corpus)
        self.avgdl = float(np.mean(list(self.dl.values()))) if self.dl else 0.0

    def idf(self, term: str) -> float:
        df = len(self.tf.get(term, {}))
        return float(np.log(1.0 + (self.N - df + 0.5) / (df + 0.5)))

    def topk(self, query: str, k: int = 10, conjunctive: bool = False):
        # same analyzer spec; duplicate query terms collapse
        terms = list(dict.fromkeys(WORD.findall(query.lower())))
        terms = [t for t in terms if t in self.tf]
        if not terms or (
            conjunctive
            and len(terms) < len(dict.fromkeys(WORD.findall(query.lower())))
        ):
            return []
        scores: dict[int, float] = defaultdict(float)
        hits: dict[int, int] = defaultdict(int)
        # canonical float-sum order = SORTED terms (matches the engine's
        # local/WAND paths exactly — float addition is not associative and
        # a last-ulp difference can flip an exact-tie ranking)
        for t in sorted(terms):
            idf_t = self.idf(t)
            for did, tf in self.tf[t].items():
                dl = self.dl[did]
                norm = tf * (self.k1 + 1.0) / (
                    tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
                )
                scores[did] += idf_t * norm
                hits[did] += 1
        items = [
            (did, s)
            for did, s in scores.items()
            if not conjunctive or hits[did] == len(terms)
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return items[:k]
