"""Build-pipeline semantics: latest-crawl dedup (A9), extraction invariant,
doc-id determinism, resume-from-checkpoint (B15), atomic publish (A15),
lineage metrics."""

from __future__ import annotations

import json
import os
import tempfile

import pyspark.sql.functions as F
import pytest

from engine.build import assign_doc_ids, build_index, latest_crawl, open_index
from engine.query import query_topk
from engine.webpages import load_webpages, with_recrawl
from tests.conftest import SF_DIR_001
from tests.golden_scorer import assign_ids


def test_latest_crawl_dedup(spark):
    """FIXTURES.md §1.1: recrawl fixture keeps only the newer row per url."""
    wp = load_webpages(spark, SF_DIR_001)
    re_wp = with_recrawl(wp)
    assert re_wp.count() == 550  # 500 + 50 dups (doc_id % 10 == 0)
    dd = latest_crawl(re_wp)
    assert dd.count() == 500
    kept = dd.filter(F.col("url").rlike("/doc/\\d*0$")).select("text").collect()
    assert kept and all(r["text"].endswith(" dup") for r in kept)


def test_doc_id_assignment_matches_independent_scheme(spark, index_cfg):
    wp = load_webpages(spark, SF_DIR_001)
    got = {
        r["url"]: r["doc_id"]
        for r in assign_doc_ids(wp, index_cfg).select("url", "doc_id").collect()
    }
    want = assign_ids(list(got), index_cfg.n_build_partitions)
    assert got == want


def test_extraction_invariant_on_fixture(spark):
    """BASELINE.json:15: extracted text byte-identical per url — with the
    text column nulled, the html fallback must reproduce it exactly."""
    from engine.analyzer import extract_series

    wp = load_webpages(spark, SF_DIR_001).limit(50)
    pdf = wp.select("url", "html", "text").toPandas()
    via_html = extract_series(
        pdf["url"], pdf["html"], pdf["text"].map(lambda _: None)
    )
    assert (via_html == pdf["text"]).all()


def test_incremental_reindex_recomputes_only_changed_pids(spark, index_cfg):
    """A3 [R] generalized to the build: reusing a checkpoint dir after the
    corpus changed must re-run SPIMI only for pids whose input fingerprint
    moved, and the result must equal a clean build of the new corpus."""
    import pyspark.sql.functions as F

    wp_v1 = load_webpages(spark, SF_DIR_001)
    # v2 = v1 plus ONE newer crawl of a single url → exactly one pid changes
    one = (
        wp_v1.orderBy("url").limit(1)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("interval 1 day"))
        .withColumn("text", F.concat(F.col("text"), F.lit(" freshdup")))
    )
    wp_v2 = wp_v1.unionByName(one)

    ck = tempfile.mkdtemp(prefix="ckpt_inc_")
    build_index(spark, wp_v1, tempfile.mkdtemp(prefix="idx_v1_"),
                index_cfg, checkpoint_dir=ck)
    mpath = os.path.join(ck, "_partials_manifest.json")
    with open(mpath) as f:
        fps_v1 = json.load(f)["pid_fingerprints"]

    # mtimes of the per-pid partials before the incremental rebuild
    pdir = os.path.join(ck, "partials")
    mtime_v1 = {
        d: os.path.getmtime(os.path.join(pdir, d))
        for d in os.listdir(pdir) if d.startswith("pid=")
    }

    h2 = build_index(spark, wp_v2, tempfile.mkdtemp(prefix="idx_v2_"),
                     index_cfg, checkpoint_dir=ck)
    with open(mpath) as f:
        fps_v2 = json.load(f)["pid_fingerprints"]
    changed = {p for p in fps_v2 if fps_v1.get(p) != fps_v2[p]}
    assert len(changed) == 1, f"exactly one pid must change, got {changed}"
    unchanged = set(fps_v1) - changed
    assert unchanged, "the single-url change must leave other pids untouched"
    for d, m in mtime_v1.items():
        pid = d.split("=")[1]
        if pid in unchanged:
            assert os.path.getmtime(os.path.join(pdir, d)) == m, (
                f"unchanged {d} was recomputed"
            )
        if pid in changed:
            assert os.path.getmtime(os.path.join(pdir, d)) > m, (
                f"changed {d} was not recomputed"
            )

    clean = build_index(spark, wp_v2, tempfile.mkdtemp(prefix="idx_v2c_"),
                        index_cfg)
    assert h2.stats["n_docs"] == clean.stats["n_docs"]
    assert abs(h2.stats["avgdl"] - clean.stats["avgdl"]) < 1e-12
    for q in ("freshdup", "spark join"):
        a = query_topk(spark, clean, q, mode="brute", with_url=False).collect()
        b_ = query_topk(spark, h2, q, mode="brute", with_url=False).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in b_
        ]


def test_resume_from_partial_checkpoint(spark, index_cfg):
    """Simulate a killed build: checkpoint manifest says only some pids
    completed; the resumed build recomputes the rest and the final index
    answers queries identically to a clean build (SURVEY.md §5.2)."""
    wp = load_webpages(spark, SF_DIR_001)
    clean_dir = tempfile.mkdtemp(prefix="idx_clean_")
    clean = build_index(spark, wp, clean_dir, index_cfg)

    ck = tempfile.mkdtemp(prefix="ckpt_")
    idx1 = tempfile.mkdtemp(prefix="idx_ck1_")
    h1 = build_index(spark, wp, idx1, index_cfg, checkpoint_dir=ck)

    # damage the manifest: pretend pids 5.. never completed
    mpath = os.path.join(ck, "_partials_manifest.json")
    with open(mpath) as f:
        manifest = json.load(f)
    assert manifest["completed_pids"] == list(range(index_cfg.n_build_partitions))
    manifest["completed_pids"] = [0, 1, 2]
    with open(mpath, "w") as f:
        json.dump(manifest, f)
    # drop the non-"completed" pid files to simulate the partial write
    import shutil

    pdir = os.path.join(ck, "partials")
    for d in os.listdir(pdir):
        if d.startswith("pid=") and int(d.split("=")[1]) > 2:
            shutil.rmtree(os.path.join(pdir, d))

    idx2 = tempfile.mkdtemp(prefix="idx_ck2_")
    h2 = build_index(spark, wp, idx2, index_cfg, checkpoint_dir=ck)
    assert h2.stats["n_docs"] == clean.stats["n_docs"]
    assert abs(h2.stats["avgdl"] - clean.stats["avgdl"]) < 1e-12

    for q in ("spark join", "the data", "vector"):
        a = query_topk(spark, clean, q, mode="brute", with_url=False).collect()
        b_ = query_topk(spark, h2, q, mode="brute", with_url=False).collect()
        assert [(r["doc_id"], round(r["score"], 9)) for r in a] == [
            (r["doc_id"], round(r["score"], 9)) for r in b_
        ]
    _ = h1  # first checkpointed build sanity-held above


def test_atomic_publish_versions(spark, index_cfg):
    """Two builds into the same root → v_0 then v_1; manifest repoints and
    readers always see a complete version (A15 analog)."""
    wp = load_webpages(spark, SF_DIR_001).limit(100)
    root = tempfile.mkdtemp(prefix="idx_pub_")
    build_index(spark, wp, root, index_cfg)
    m1 = json.load(open(os.path.join(root, "_manifest.json")))
    build_index(spark, wp, root, index_cfg)
    m2 = json.load(open(os.path.join(root, "_manifest.json")))
    assert m1["version"] == "v_0" and m2["version"] == "v_1"
    h = open_index(root)
    assert h.version_dir.endswith("v_1")


def test_lineage_metrics_per_partition(spark, built_index, index_cfg):
    m = spark.read.parquet(built_index.metrics_path)
    rows = m.collect()
    assert 0 < len(rows) <= index_cfg.n_build_partitions
    assert sum(r["n_docs"] for r in rows) == built_index.stats["n_docs"]
    assert all(r["n_postings"] >= r["n_terms"] for r in rows)


def test_facet_counts(spark, built_index):
    """B16: facet counts by lang over the docs table."""
    docs = spark.read.parquet(built_index.docs_path)
    facets = {
        r["lang"]: r["cnt"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert sum(facets.values()) == 500
    assert set(facets) == {"de", "en", "es", "fr", "zh"}


def test_bucket_byte_metrics(spark, built_index):
    """B15: per-write-task byte metrics — encoded bytes per bucket sum to
    the real on-disk payload and cover every posting."""
    import os

    bm = spark.read.parquet(
        os.path.join(built_index.version_dir, "bucket_metrics")
    ).collect()
    assert len(bm) > 0
    total_postings = sum(r["n_postings"] for r in bm)
    terms = spark.read.parquet(built_index.terms_path)
    assert total_postings == terms.agg(F.sum("df")).collect()[0][0]
    assert all(r["encoded_bytes"] > 0 for r in bm)


def test_pid_fingerprint_sees_content_changes(spark):
    """Round-3 advice (engine/build.py _pid_fingerprints): the incremental
    fingerprint must move for every change that can change the pid's build
    output — same-length text edits, html edits on html-fallback rows, lang
    changes, and duplicated rows — and must be invariant to row order and
    partitioning."""
    from datetime import datetime

    from engine.build import _pid_fingerprints

    rows = [
        (0, "u://a", "alpha text", datetime(2024, 1, 1), None, "en"),
        (0, "u://b", None, datetime(2024, 1, 2), b"<p>hb</p>", "en"),
        (1, "u://c", "gamma", datetime(2024, 1, 3), None, "de"),
    ]
    schema = "pid int, url string, text string, warc_ts timestamp, html binary, lang string"

    def fp(rs, n=4):
        return _pid_fingerprints(spark.createDataFrame(rs, schema).repartition(n))

    base = fp(rows)
    # order/partitioning invariance
    assert fp(list(reversed(rows)), n=2) == base
    # same-byte-length text edit (the case length-only hashing missed)
    assert fp([(0, "u://a", "alpha tex7", *rows[0][3:]), rows[1], rows[2]]) != base
    # html edit on a text-null (fallback) row
    assert fp([rows[0], (0, "u://b", None, rows[1][3], b"<p>hc</p>", "en"), rows[2]]) != base
    # lang change
    assert fp([rows[0], rows[1], (1, "u://c", "gamma", rows[2][3], None, "fr")]) != base
    # duplicated row must not cancel (sum combine, not xor)
    assert fp(rows + [rows[0]]) != base
    # unrelated pid untouched
    moved = fp([(0, "u://a", "ALPHA", *rows[0][3:]), rows[1], rows[2]])
    assert moved[1] == base[1] and moved[0] != base[0]


def test_keep_snapshots_retention_from_build(spark, index_cfg):
    """cfg.keep_snapshots wires Iceberg-style retention into the publish
    path: three builds with keep_snapshots=2 leave exactly the two newest
    versions readable (older dirs gone, pinning them raises)."""
    import dataclasses

    from engine.publish import list_snapshots, read_manifest

    cfg = dataclasses.replace(index_cfg, keep_snapshots=2)
    wp = load_webpages(spark, SF_DIR_001).limit(80)
    root = tempfile.mkdtemp(prefix="idx_keep_")
    for _ in range(3):
        build_index(spark, wp, root, cfg)
    assert [s["version"] for s in list_snapshots(root)] == ["v_1", "v_2"]
    dirs = sorted(d for d in os.listdir(root) if d.startswith("v_"))
    assert dirs == ["v_1", "v_2"]
    assert read_manifest(root)["version"] == "v_2"
    h = open_index(root, version="v_1")  # kept historical version readable
    assert h.version_dir.endswith("v_1")
    with pytest.raises(KeyError):
        read_manifest(root, version="v_0")


def _postings_hash(spark, handle):
    """Same xor-of-block-hashes expression bench.py reports as
    index_content_hash — byte-level identity of every compressed block."""
    return (
        spark.read.parquet(handle.postings_path)
        .select(
            F.xxhash64(
                "term", "salt", "block_seq", "n", "first_doc_id",
                "last_doc_id", "ids_enc", "tfs_enc", "dls_enc"
            ).alias("h")
        )
        .agg(F.expr("bit_xor(h)").alias("x"))
        .collect()[0]["x"]
    )


def test_spimi_spill_byte_identical_index(spark, index_cfg):
    """SPIMI partial spill (cfg.spimi_flush_mb): a build forced to flush its
    posting accumulators many times mid-partition must produce a
    byte-identical index to the unflushed build — the merge stage unions
    multi-row partials per (term, pid) exactly like partials from distinct
    pids, and doc ids keep ascending across flushes."""
    import dataclasses

    wp = load_webpages(spark, SF_DIR_001)
    a = build_index(spark, wp, tempfile.mkdtemp(prefix="idx_noflush_"), index_cfg)
    cfg_spill = dataclasses.replace(
        index_cfg, spimi_flush_mb=0.02, arrow_batch_rows=64
    )
    b = build_index(spark, wp, tempfile.mkdtemp(prefix="idx_flush_"), cfg_spill)
    assert a.stats["n_docs"] == b.stats["n_docs"]
    assert _postings_hash(spark, a) == _postings_hash(spark, b)


def test_spimi_flush_emits_multiple_partial_frames(index_cfg):
    """The spill path actually triggers: driving the mapInPandas body
    directly with a tiny budget yields posting partials across several
    frames (not one end-of-stream frame), and the same (term, pid) may
    appear in more than one of them."""
    import dataclasses

    import pandas as pd

    from engine.build import _fused_spimi

    cfg = dataclasses.replace(index_cfg, spimi_flush_mb=0.001)  # ~52 cells
    fn = _fused_spimi(cfg, dedup=False)
    batches = [
        pd.DataFrame(
            {
                "url": [f"https://x.test/{i}/{j}" for j in range(8)],
                "pid": [0] * 8,
                "text": ["the quick brown fox jumps over lazy dogs"] * 8,
                "lang": ["en"] * 8,
            }
        )
        for i in range(4)
    ]
    outs = list(fn(iter(batches)))
    posting_frames = [
        o for o in outs if (o["term"] != "").any()
    ]
    assert len(posting_frames) > 1  # spilled at least once mid-stream
    # the same (pid, term) appears in >1 partial frame → merge must union
    seen: dict[tuple, int] = {}
    for o in posting_frames:
        for t in set(o.loc[o["term"] != "", "term"]):
            seen[(0, t)] = seen.get((0, t), 0) + 1
    assert max(seen.values()) > 1


def test_spimi_flush_spills_docmap_accumulators(index_cfg):
    """r4 verdict "What's wrong #4": the flush budget must bound the per-pid
    docmap arrays too, not just the posting accumulators. A sub-MB budget
    over a many-tiny-docs stream emits >1 pseudo (term="") docmap row per
    pid, and the concatenated docmap is identical to the unflushed one
    (doc ids keep ascending across flushes via rank_ctr)."""
    import dataclasses

    import numpy as np
    import pandas as pd

    from engine.build import _fused_spimi

    def batches():
        return [
            pd.DataFrame(
                {
                    "url": [f"https://x.test/{i}/{j}" for j in range(50)],
                    "pid": [0] * 50,
                    "text": ["tok"] * 50,  # 1 token per doc: docmap-dominated
                    "lang": ["en"] * 50,
                }
            )
            for i in range(6)
        ]

    def pseudo(cfg):
        outs = list(_fused_spimi(cfg, dedup=False)(iter(batches())))
        rows = pd.concat(outs, ignore_index=True)
        return rows[rows["term"] == ""].reset_index(drop=True)

    pa = pseudo(index_cfg)  # no flush budget
    pb = pseudo(dataclasses.replace(index_cfg, spimi_flush_mb=0.001))
    assert len(pa) == 1
    assert len(pb) > 1  # docmap spilled mid-stream
    for col in ("doc_ids", "dls", "urls", "fps"):
        ca = np.concatenate([np.asarray(x) for x in pa[col]])
        cb = np.concatenate([np.asarray(x) for x in pb[col]])
        assert ca.tolist() == cb.tolist(), col
