"""Phrase-query semantics (engine/phrase.py, SURVEY.md §2.B18): adjacency
under the engine analyzer, token-boundary exactness, BM25-sum ranking
consistency with the brute scorer, and degenerate inputs. The exact-values
gate vs ANSI SQL is tests/test_oracle_parity.py::bm25_phrase."""

from __future__ import annotations

import datetime
import tempfile

import pytest


def _wp_rows():
    ts = datetime.datetime(2024, 1, 1)
    mk = lambda i, text: (  # noqa: E731
        f"https://t.example.com/doc/{i}", ts, None, text, "en"
    )
    return [
        mk(0, "alpha data table beta"),        # phrase hit
        mk(1, "data x table"),                  # both terms, not adjacent
        mk(2, "data tables here"),              # substring, not a token match
        mk(3, "table data"),                    # reversed order
        mk(4, "data table data table data"),   # hit, highest tf
        mk(5, "alpha beta gamma"),              # neither term
        mk(6, "Data TABLE upper"),              # analyzer lowercases → hit
    ]


@pytest.fixture(scope="module")
def tiny_index(spark, index_cfg):
    from engine.build import build_index

    wp = spark.createDataFrame(
        _wp_rows(),
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    h = build_index(spark, wp, tempfile.mkdtemp(prefix="idx_phrase_"),
                    index_cfg)
    return h, wp


def test_phrase_adjacency_and_token_boundaries(spark, tiny_index):
    from engine.phrase import phrase_topk

    h, wp = tiny_index
    out = phrase_topk(spark, h, wp, "data table", k=10).collect()
    urls = {r["url"] for r in out}
    assert urls == {
        "https://t.example.com/doc/0",
        "https://t.example.com/doc/4",
        "https://t.example.com/doc/6",
    }


def test_phrase_scores_match_conjunctive_brute(spark, tiny_index):
    """Phrase ranking = conjunctive BM25 sum restricted to phrase hits."""
    from engine.phrase import phrase_topk
    from engine.query import query_topk

    h, wp = tiny_index
    phrase = {r["url"]: r["score"]
              for r in phrase_topk(spark, h, wp, "data table", k=10).collect()}
    brute = {r["url"]: r["score"]
             for r in query_topk(spark, h, "data table", k=10, mode="brute",
                                 conjunctive=True, with_url=True).collect()}
    for url, s in phrase.items():
        assert brute[url] == pytest.approx(s, abs=1e-9)


def test_phrase_degenerate_inputs(spark, tiny_index):
    from engine.phrase import phrase_topk

    h, wp = tiny_index
    assert phrase_topk(spark, h, wp, "", k=5).count() == 0
    assert phrase_topk(spark, h, wp, "data zzznope", k=5).count() == 0
    # single-term "phrase" degenerates to plain conjunctive top-k
    one = phrase_topk(spark, h, wp, "alpha", k=5).collect()
    assert {r["url"] for r in one} == {
        "https://t.example.com/doc/0", "https://t.example.com/doc/5"
    }


def test_phrase_on_fixture_counts(spark, built_index):
    """sf0.001 sanity: every returned doc's token stream really contains the
    phrase (independent pandas re-check), and k caps the result."""
    from engine.phrase import phrase_topk
    from engine.analyzer import tokenize
    from engine.webpages import load_webpages

    wp = load_webpages(spark, "/root/testdata/sf0.001")
    out = phrase_topk(spark, built_index, wp, "sort merge", k=10).collect()
    assert len(out) == 10  # 39 matching docs at sf0.001 (duckdb probe)
    texts = {r["url"]: r["text"] for r in
             wp.join(spark.createDataFrame([(r["url"],) for r in out],
                                           "url string"),
                     "url", "left_semi").select("url", "text").collect()}
    for r in out:
        toks = " ".join(tokenize(texts[r["url"]]))
        assert " sort merge " in f" {toks} "
    # scores are descending with url tiebreak
    pairs = [(r["score"], r["url"]) for r in out]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


@pytest.fixture(scope="module")
def lang_index(spark, index_cfg):
    """Corpus where post-filtering a plain top-k would miss every 'fr' doc:
    12 high-tf 'en' docs dominate any unfiltered top-10."""
    from engine.build import build_index

    ts = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(12):  # en: "spark" repeated → top unfiltered scores
        rows.append((f"https://en.example.com/doc/{i}", ts, None,
                     "spark " * 5 + "filler", "en"))
    for i in range(6):  # fr: single occurrence each
        rows.append((f"https://fr.example.com/doc/{i}", ts, None,
                     "spark mention ici", "fr"))
    wp = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    h = build_index(spark, wp, tempfile.mkdtemp(prefix="idx_lang_"),
                    index_cfg)
    return h, wp


def test_filtered_topk_filters_before_cut(spark, lang_index):
    """filtered_topk returns the fr docs a naive top-k-then-filter drops."""
    import pyspark.sql.functions as F

    from engine.phrase import filtered_topk
    from engine.query import query_topk

    h, wp = lang_index
    out = filtered_topk(spark, h, wp, "spark", F.col("lang") == "fr",
                        k=10).collect()
    assert len(out) == 6
    assert all(r["url"].startswith("https://fr.") for r in out)
    # the naive plan: unfiltered top-10 then post-filter → zero fr docs
    naive = query_topk(spark, h, "spark", k=10, mode="brute",
                       with_url=True).collect()
    assert all(r["url"].startswith("https://en.") for r in naive)


def test_filtered_topk_scores_match_unfiltered_brute(spark, lang_index):
    """Scores are the plain BM25 scores — filtering changes the candidate
    set, never the scoring (df/avgdl stay corpus-wide, as in ES/Lucene)."""
    import pyspark.sql.functions as F

    from engine.phrase import filtered_topk
    from engine.query import query_topk

    h, wp = lang_index
    filt = {r["url"]: r["score"]
            for r in filtered_topk(spark, h, wp, "spark",
                                   F.col("lang") == "fr", k=10).collect()}
    full = {r["url"]: r["score"]
            for r in query_topk(spark, h, "spark", k=100, mode="brute",
                                with_url=True).collect()}
    for url, s in filt.items():
        assert full[url] == pytest.approx(s, abs=1e-9)
