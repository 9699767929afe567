"""Inverted-index build (SURVEY.md §2.B1–B9, §3.2; north rule BASELINE.json:14).

Pipeline (all DataFrame-declared; Python boundaries are Arrow-batched):

1.  latest-crawl dedup per url (reference A9 dedup-to-latest generalized:
    `metadata_indexer.py` keep-latest-analysis ≈L850–950 [R, SURVEY.md §2.A9]).
2.  deterministic doc-id assignment — doc_id = rank_in_bucket * P + bucket
    with bucket = crc32(url) % P. Depends only on the url set and P, never on
    Spark partitioning, so the index bytes are identical at local[8] and
    local[32] (scaling-bench precondition, SURVEY.md §5.2) and the scheme
    needs no global sort at 10^12 docs (per-bucket window only).
3.  SPIMI per-partition posting construction via mapInPandas (BASELINE.json:6):
    tokenize+extract via Arrow kernels, per-partition term→postings grouping,
    emits TRANSIT-ENCODED partials (one row per term per partition, postings
    as varint-delta binary — shuffle row count is O(distinct terms ×
    partitions) and shuffle bytes ~2-4 B/posting instead of 16).
4.  stats: docs (doc_id,url,dl), N, avgdl, terms (df, cf) — partial+final agg.
5.  salted repartition-by-term merge (BASELINE.json:6): hot terms
    (df ≥ threshold) are split by doc-range salt = doc_id // range_size
    *before* the term shuffle, bounding per-group memory under stopword-grade
    skew; cold terms use salt 0. Salt boundaries depend only on (N, config).
6.  per-(term,salt) applyInPandas: merge-sort postings, chunk into blocks of
    128, delta+varint/FOR compress, per-block max BM25 score (§2.B8).
7.  sinks: postings partitioned by term bucket (query-time partition
    pruning), terms/docs/metrics parquet, stats JSON; atomic manifest publish
    (reference A15 alias swap analog).

Resumable from per-partition checkpoints (north rule): stage-3 partials are
checkpointed per build-bucket; a re-run recomputes only missing buckets
(SURVEY.md §2.B15).
"""

from __future__ import annotations

import json
import math
import os
import time
import zlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import types as T

from engine.analyzer import extract_series, factorized_tokens
from engine.codec import (
    bm25_tf_norm,
    delta_decode_blocks,
    encode_blocks,
    idf,
    varint_decode_concat,
    varint_encode_rows,
)
from engine.config import IndexConfig
from engine.publish import atomic_publish, read_manifest

# Pseudo-term row carrying (doc_id, dl) pairs per build partition so doc
# lengths ride the same SPIMI pass (empty string is never a tokenizer output).
DOC_PSEUDO_TERM = ""

# Term partials travel TRANSIT-ENCODED (varint bytes, ~4-6x smaller than
# int64 arrays): the term shuffle is the build's largest data movement, so
# postings cross it as (n, tf_sum, ids_enc=varint gaps w/ absolute first,
# tfs_enc, dls_enc). The at-rest block codec in the merge stage is
# unchanged — index bytes stay identical. Pseudo rows (term="") carry the
# per-pid docmap as plain arrays (they are exploded JVM-side for the docs
# table and are a tiny fraction of the volume).
PARTIALS_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("term", T.StringType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("tf_sum", T.LongType()),
        T.StructField("ids_enc", T.BinaryType()),
        T.StructField("tfs_enc", T.BinaryType()),
        T.StructField("dls_enc", T.BinaryType()),
        # docmap payload, set only on the pseudo row (term = "")
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("dls", T.ArrayType(T.IntegerType())),
        T.StructField("urls", T.ArrayType(T.StringType())),
        T.StructField("langs", T.ArrayType(T.StringType())),
        # per-doc extracted-text fingerprint (vectorized 64-bit hash) —
        # backs snapshot-diff change detection (docs_changed_between)
        T.StructField("fps", T.ArrayType(T.LongType())),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("salt", T.IntegerType()),
        T.StructField("block_seq", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("first_doc_id", T.LongType()),
        T.StructField("last_doc_id", T.LongType()),
        T.StructField("max_score", T.DoubleType()),
        T.StructField("codec_ids", T.IntegerType()),
        T.StructField("ids_enc", T.BinaryType()),
        T.StructField("codec_tfs", T.IntegerType()),
        T.StructField("tfs_enc", T.BinaryType()),
        T.StructField("codec_dls", T.IntegerType()),
        T.StructField("dls_enc", T.BinaryType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)


def latest_crawl(webpages: DataFrame) -> DataFrame:
    """Keep only the newest crawl per url (A9: dedup-to-latest; ties broken
    by larger text then by content hash, so the winner is a pure function of
    the row set — the byte-identical-index determinism invariant holds even
    for equal-ts equal-length crawls with different content)."""
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.length("text")), F.desc(F.md5("text"))
    )
    return (
        webpages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_doc_ids(webpages: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Deterministic dense-ish doc ids: bucket = crc32(url) % P (same value
    as python zlib.crc32 — replicated by the independent golden scorer),
    doc_id = rank_in_bucket * P + bucket. Scales: only a per-bucket sort
    (window), no global sort; documented partition-offset variant of
    SURVEY.md §7.2.5."""
    P = cfg.n_build_partitions
    bucketed = webpages.withColumn(
        "pid", (F.crc32(F.encode(F.col("url"), "utf-8")) % P).cast("int")
    )
    w = Window.partitionBy("pid").orderBy("url")
    return bucketed.withColumn(
        "doc_id",
        ((F.row_number().over(w) - F.lit(1)).cast("long") * P + F.col("pid")),
    )


def _fused_spimi(cfg: IndexConfig, dedup: bool):
    """mapInPandas body fusing three stages into the single corpus shuffle
    (repartition by pid + sortWithinPartitions(url, warc_ts desc, len desc)):

    1. latest-crawl dedup per url (A9) — rows arrive url-sorted with the
       newest crawl first, so dedup = keep first row per url (O(1) state
       across Arrow batches; never buffers raw text — bounded memory at any
       partition size, spill handled by the upstream Tungsten sort);
    2. deterministic doc-id assignment — doc_id = rank_in_pid * P + pid,
       rank = position of the url among the pid's deduped sorted urls
       (pure function of the url set + P: identical at any parallelism);
    3. SPIMI per-partition posting construction (B4): terms are factorized
       to integer codes per batch (strings touched once), then one lexsort +
       run-length pass aggregates (pid, term, doc) → tf. No object-dtype
       groupby — that is memory-bandwidth-bound at high core counts.

    A Spark partition can hold several pids (hash distribution is not
    bijective) — all state is per pid. The pseudo row (term="") carries the
    docmap (doc_id, dl, url, lang) so stats need no extra corpus pass.
    """
    P = cfg.n_build_partitions

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vocab: dict[str, int] = {}
        vocab_list: list[str] = []
        acc_codes: list[np.ndarray] = []
        acc_docs: list[np.ndarray] = []
        acc_dls: list[np.ndarray] = []
        acc_pids: list[np.ndarray] = []
        doc_ids_all: dict[int, list[np.ndarray]] = {}
        dls_all: dict[int, list[np.ndarray]] = {}
        urls_all: dict[int, list[np.ndarray]] = {}
        langs_all: dict[int, list[np.ndarray]] = {}
        fps_all: dict[int, list[np.ndarray]] = {}
        rank_ctr: dict[int, int] = {}
        last_url: str | None = None
        n_cells = 0  # accumulated posting cells ≈ 20 B each across streams
        n_dcells = 0  # docmap entries ≈ 32 B/doc, counted as 2 cells each
        budget_cells = (
            max(1, int(cfg.spimi_flush_mb * (1 << 20)) // 20)
            if cfg.spimi_flush_mb
            else None
        )
        _ROW_COLS = (
            "pid", "term", "n", "tf_sum", "ids_enc", "tfs_enc", "dls_enc",
            "doc_ids", "dls", "urls", "langs", "fps",
        )

        def _drain_postings(out_rows: dict) -> None:
            """Emit the accumulated posting partials into out_rows and reset
            the posting accumulators (docmap/rank/dedup state is untouched).
            Called at end-of-partition and mid-stream whenever the configured
            spimi_flush_mb budget is exceeded (classic SPIMI spill-to-run,
            bounding task memory independent of partition size). Flushed and
            unflushed builds are byte-identical: doc ids keep ascending
            across flushes of a pid (rank_ctr carries), every flushed row is
            a self-contained delta stream with an absolute first value, and
            the merge stage lexsorts each (term, salt) group's postings
            before block-cutting, so extra partial rows per (term, pid)
            merge exactly like partials from distinct pids."""
            nonlocal vocab, vocab_list, acc_codes, acc_docs, acc_dls
            nonlocal acc_pids, n_cells
            if not acc_codes:
                return
            codes = np.concatenate(acc_codes)
            docs_f = np.concatenate(acc_docs)
            dls_f = np.concatenate(acc_dls)
            pids_f = np.concatenate(acc_pids)
            # ONE stable argsort on a combined (pid, code) key: doc_ids are
            # already ascending within each pid (rows arrive url-sorted), so
            # stability gives doc-sorted runs for free — ~3x cheaper than a
            # 3-key lexsort, which dominated this stage at 32 workers
            V = np.int64(len(vocab_list))
            key = pids_f.astype(np.int64) * V + codes
            order = np.argsort(key, kind="stable")
            key_s = key[order]
            docs_f = docs_f[order]
            dls_f = dls_f[order]
            # run boundaries at (key, doc) change → tf per posting
            change = np.empty(len(key_s), dtype=bool)
            change[0] = True
            change[1:] = (key_s[1:] != key_s[:-1]) | (docs_f[1:] != docs_f[:-1])
            starts = np.flatnonzero(change)
            tf = np.diff(np.append(starts, len(key_s))).astype(np.int32)
            p_doc = docs_f[starts]
            p_dl = dls_f[starts].astype(np.int32)
            p_key = key_s[starts]
            p_code = (p_key % V).astype(np.int64)
            p_pid = (p_key // V).astype(np.int64)
            # row boundaries at (pid, code) change
            rchange = np.empty(len(starts), dtype=bool)
            rchange[0] = True
            rchange[1:] = p_key[1:] != p_key[:-1]
            rstarts = np.flatnonzero(rchange)
            # transit encode (one vectorized pass per stream): doc ids as
            # within-row deltas with an absolute first value
            gaps = p_doc.astype(np.uint64).copy()
            gaps[1:] = p_doc[1:].astype(np.uint64) - p_doc[:-1].astype(np.uint64)
            gaps[rstarts] = p_doc[rstarts].astype(np.uint64)
            ids_bufs = varint_encode_rows(gaps, rstarts)
            tfs_bufs = varint_encode_rows(tf.astype(np.uint64), rstarts)
            dls_bufs = varint_encode_rows(p_dl.astype(np.uint64), rstarts)
            row_n = np.diff(np.append(rstarts, len(starts)))
            row_tf_sum = np.add.reduceat(tf.astype(np.int64), rstarts)
            out_rows["pid"].extend(p_pid[rstarts].tolist())
            out_rows["term"].extend(
                vocab_list[int(c)] for c in p_code[rstarts]
            )
            out_rows["n"].extend(row_n.tolist())
            out_rows["tf_sum"].extend(row_tf_sum.tolist())
            out_rows["ids_enc"].extend(ids_bufs)
            out_rows["tfs_enc"].extend(tfs_bufs)
            out_rows["dls_enc"].extend(dls_bufs)
            nrows_t = len(rstarts)
            for col in ("doc_ids", "dls", "urls", "langs", "fps"):
                out_rows[col].extend([None] * nrows_t)
            vocab = {}
            vocab_list = []
            acc_codes, acc_docs, acc_dls, acc_pids = [], [], [], []
            n_cells = 0

        def _drain_docmap(out_rows: dict) -> None:
            """Emit the accumulated per-pid docmap arrays as pseudo rows
            (term="") and reset them — called at end-of-partition and at
            every budget flush, so the flush contract bounds BOTH
            accumulator families (r4 verdict "What's wrong #4"): a
            partition of pathologically many tiny docs can no longer grow
            the docmap unbounded. Multiple pseudo rows per pid are exact:
            the docs stage explodes each row independently (no groupBy),
            doc ids keep ascending across flushes (rank_ctr carries), and
            the docs table is keyed by doc_id — row multiplicity per pid
            never matters downstream."""
            nonlocal doc_ids_all, dls_all, urls_all, langs_all, fps_all
            nonlocal n_dcells
            for pid, ids in doc_ids_all.items():
                out_rows["pid"].append(pid)
                out_rows["term"].append(DOC_PSEUDO_TERM)
                out_rows["n"].append(0)
                out_rows["tf_sum"].append(0)
                out_rows["ids_enc"].append(None)
                out_rows["tfs_enc"].append(None)
                out_rows["dls_enc"].append(None)
                out_rows["doc_ids"].append(np.concatenate(ids))
                out_rows["dls"].append(
                    np.concatenate(dls_all[pid]).astype(np.int32)
                )
                out_rows["urls"].append(np.concatenate(urls_all[pid]))
                out_rows["langs"].append(np.concatenate(langs_all[pid]))
                out_rows["fps"].append(np.concatenate(fps_all[pid]))
            doc_ids_all, dls_all, urls_all, langs_all, fps_all = (
                {}, {}, {}, {}, {}
            )
            n_dcells = 0

        for pdf in batches:
            if len(pdf) == 0:
                continue
            if dedup:
                urls = pdf["url"]
                keep = urls.ne(urls.shift(1))
                keep.iloc[0] = urls.iloc[0] != last_url
                last_url = urls.iloc[-1]
                if not keep.all():
                    pdf = pdf[keep.to_numpy()]
                    if len(pdf) == 0:
                        continue
            pids = pdf["pid"].to_numpy(dtype=np.int64)
            # per-pid rank with cross-batch carry
            ranks = pd.Series(pids).groupby(pids).cumcount().to_numpy(np.int64)
            for pid in np.unique(pids):
                pid = int(pid)
                sel = pids == pid
                ranks[sel] += rank_ctr.get(pid, 0)
                rank_ctr[pid] = int(ranks[sel][-1]) + 1
            doc_ids = ranks * P + pids
            text = extract_series(pdf["url"], pdf.get("html"), pdf["text"])
            # Arrow-kernel tokenize + dictionary-encode: the token stream
            # never materializes as Python objects (bandwidth, not CPU, is
            # the binding constraint at high core counts)
            bcodes, buniq, dls = factorized_tokens(text.to_numpy(dtype=object))
            if dls.sum():
                remap = np.empty(len(buniq), dtype=np.int64)
                for j, tm in enumerate(buniq):
                    code = vocab.get(tm)
                    if code is None:
                        code = len(vocab_list)
                        vocab[tm] = code
                        vocab_list.append(tm)
                    remap[j] = code
                acc_codes.append(remap[bcodes].astype(np.int32))
                acc_docs.append(np.repeat(doc_ids, dls))
                acc_pids.append(np.repeat(pids.astype(np.int32), dls))
                acc_dls.append(np.repeat(dls.astype(np.int32), dls))
                n_cells += int(dls.sum())
            url_arr = pdf["url"].to_numpy(dtype=object)
            lang_arr = (
                pdf["lang"].to_numpy(dtype=object)
                if "lang" in pdf.columns
                else np.full(len(pdf), None, dtype=object)
            )
            # vectorized 64-bit content fingerprint of the extracted text
            # (deterministic: fixed default hash key) — docmap lineage column
            fp_arr = (
                pd.util.hash_pandas_object(text, index=False)
                .to_numpy(np.uint64)
                .view(np.int64)
            )
            for pid in np.unique(pids):
                pid = int(pid)
                sel_doc = pids == pid
                doc_ids_all.setdefault(pid, []).append(doc_ids[sel_doc])
                dls_all.setdefault(pid, []).append(dls[sel_doc])
                urls_all.setdefault(pid, []).append(url_arr[sel_doc])
                langs_all.setdefault(pid, []).append(lang_arr[sel_doc])
                fps_all.setdefault(pid, []).append(fp_arr[sel_doc])
            n_dcells += 2 * len(pdf)
            if budget_cells is not None and (
                n_cells + n_dcells >= budget_cells
            ):
                flushed: dict[str, list] = {c: [] for c in _ROW_COLS}
                _drain_postings(flushed)
                _drain_docmap(flushed)
                if flushed["pid"]:
                    yield pd.DataFrame(flushed)
        out_rows: dict[str, list] = {c: [] for c in _ROW_COLS}
        _drain_postings(out_rows)
        _drain_docmap(out_rows)
        if out_rows["pid"]:  # empty partitions yield nothing (pandas gives
            yield pd.DataFrame(out_rows)  # empty cols float64 → Arrow error

    return fn


def _salt_split(cfg: IndexConfig, range_size: int, hot_df: dict[str, int]):
    """Narrow map: split hot-term partials at doc-range boundaries so the
    term shuffle is salted (B7). Hotness comes from the closure-shipped
    `hot_df` dict ({term: df}, only terms with df >= threshold): the hot set
    is provably tiny (df >= N/n_doc_ranges bounds it to ~n_doc_ranges*avgdl
    terms — thousands at any corpus size), so shipping it beats the previous
    full-vocabulary `df` join, which forced the ENTIRE transit-encoded
    partials payload through an extra exchange (guide §2.3/§2.4: the df
    values ride a few KB of closure instead of re-shuffling the heavy rows;
    cold groups recover df exactly as their own merged posting count). Cold
    rows (the vast majority of the vocabulary) pass through untouched:
    decoding and re-encoding a single-segment row is a byte identity, so
    skipping it changes nothing downstream and saves a full decode+encode
    pass over ~90% of rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if hot_df:
                df_col = (
                    pdf["term"].map(hot_df).fillna(0).to_numpy(np.int64)
                )
            else:
                df_col = np.zeros(len(pdf), dtype=np.int64)
            pdf = pdf.assign(df=df_col)
            hot_row = df_col > 0
            cold = pdf.loc[~hot_row]
            if len(cold):
                yield cold  # already salt_schema-shaped, salt=0
            pdf = pdf.loc[hot_row].reset_index(drop=True)
            if len(pdf) == 0:
                continue
            # vectorized over the hot slice: bulk-decode the transit
            # buffers once, compute per-posting salt keys, cut at
            # (row, salt) boundaries, and re-encode the segments with one
            # pass per stream. Postings inside a partial are doc-sorted
            # (SPIMI emits sorted runs), so salts are monotonic within a
            # row — boundary detection needs no sort.
            nrows = len(pdf)
            lens = pdf["n"].to_numpy(np.int64)
            gaps_f = varint_decode_concat(pdf["ids_enc"])
            ids_f = delta_decode_blocks(gaps_f, lens).astype(np.int64)
            tfs_f = varint_decode_concat(pdf["tfs_enc"])
            dls_f = varint_decode_concat(pdf["dls_enc"])
            row_of = np.repeat(np.arange(nrows, dtype=np.int64), lens)
            salt_f = (ids_f // range_size + 1).astype(np.int64)
            boundary = np.empty(len(ids_f), dtype=bool)
            if len(ids_f):
                boundary[0] = True
                boundary[1:] = (row_of[1:] != row_of[:-1]) | (
                    salt_f[1:] != salt_f[:-1]
                )
            starts = np.flatnonzero(boundary)
            seg_row = row_of[starts]
            # re-delta at segment boundaries (absolute first per segment)
            seg_gaps = ids_f.astype(np.uint64).copy()
            seg_gaps[1:] = ids_f[1:].astype(np.uint64) - ids_f[:-1].astype(
                np.uint64
            )
            seg_gaps[starts] = ids_f[starts].astype(np.uint64)
            out = pd.DataFrame(
                {
                    "pid": pdf["pid"].to_numpy()[seg_row],
                    "term": pdf["term"].to_numpy(object)[seg_row],
                    "salt": salt_f[starts].astype(np.int32),
                    "df": pdf["df"].to_numpy()[seg_row],
                    "n": np.diff(np.append(starts, len(ids_f))).astype(
                        np.int32
                    ),
                    "ids_enc": varint_encode_rows(seg_gaps, starts),
                    "tfs_enc": varint_encode_rows(tfs_f, starts),
                    "dls_enc": varint_encode_rows(dls_f, starts),
                }
            )
            if len(out):
                yield out

    return fn


def _merge_compress(cfg: IndexConfig, n_docs: int, avgdl: float):
    """Merge + compress over a (term, salt)-sorted partition stream: merge-
    sort each group's partials, block-chunk, delta + varint/FOR compress
    (analytic per-block codec choice, one vectorized encode pass per
    stream), per-block max BM25 score (B8/B13).

    Runs as mapInPandas over `repartition(term, salt).sortWithinPartitions`
    rather than groupBy().applyInPandas: the vocabulary has millions of
    tiny groups and grouped-map materializes a pandas DataFrame per group —
    pure per-group overhead that dominates the phase (measured 8 s of an
    11 s build at 5k docs). Here every Arrow batch is processed as ONE
    vectorized pass across all its groups (group ids from term/salt change
    detection, one lexsort, reduceat aggregation, batched encodes); a group
    that straddles an Arrow batch boundary is held back and stitched onto
    the next batch, so each group is still compressed exactly once, whole."""
    k1, b, bs = cfg.k1, cfg.b, cfg.block_size
    n_buckets = cfg.n_term_buckets

    def process(pdf: pd.DataFrame) -> pd.DataFrame:
        nrows = len(pdf)
        ns = pdf["n"].to_numpy(np.int64)
        ids = delta_decode_blocks(
            varint_decode_concat(pdf["ids_enc"]), ns
        ).astype(np.int64)
        tfs = varint_decode_concat(pdf["tfs_enc"]).astype(np.int64)
        dls = varint_decode_concat(pdf["dls_enc"]).astype(np.int64)
        terms_arr = pdf["term"].to_numpy(object)
        salts_arr = pdf["salt"].to_numpy(np.int32)
        new_grp = np.empty(nrows, dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (terms_arr[1:] != terms_arr[:-1]) | (
            salts_arr[1:] != salts_arr[:-1]
        )
        grp_of_row = np.cumsum(new_grp) - 1
        n_grp = int(grp_of_row[-1]) + 1
        grp_first_row = np.flatnonzero(new_grp)
        # one stable sort puts every group's postings in doc order (doc ids
        # are unique within a group: a doc lives in exactly one pid)
        grp_of_post = np.repeat(grp_of_row, ns)
        if len(grp_of_post) == 0:
            return pd.DataFrame()
        order = np.lexsort((ids, grp_of_post))
        ids, tfs, dls = ids[order], tfs[order], dls[order]
        gsorted = grp_of_post[order]
        grp_counts = np.bincount(grp_of_post, minlength=n_grp)
        grp_off = np.concatenate(([0], np.cumsum(grp_counts)))
        # block starts: every bs-th posting within its group
        pos_in_grp = np.arange(len(ids), dtype=np.int64) - grp_off[gsorted]
        starts = np.flatnonzero(pos_in_grp % bs == 0)
        ends = np.append(starts[1:], len(ids))
        blk_grp = gsorted[starts]
        # per-group scoring inputs: hot groups carry their true df from the
        # closure-shipped hot set; cold groups (df=0 sentinel) recover it
        # exactly as their own merged posting count (a cold term's single
        # salt-0 group holds ALL its postings, one per containing doc)
        df_g = pdf["df"].to_numpy(np.int64)[grp_first_row]
        df_g = np.where(df_g > 0, df_g, grp_counts)
        contrib = idf(n_docs, df_g)[gsorted] * bm25_tf_norm(
            tfs, dls, k1, b, avgdl
        )
        max_scores = np.maximum.reduceat(contrib, starts)
        # delta with per-block absolute first value (self-contained blocks;
        # group boundaries always coincide with block starts, so deltas
        # never leak across groups)
        gaps = ids.astype(np.uint64).copy()
        gaps[1:] = ids[1:].astype(np.uint64) - ids[:-1].astype(np.uint64)
        gaps[starts] = ids[starts].astype(np.uint64)
        ci, ebufs = encode_blocks(gaps, starts)
        ct, tbufs = encode_blocks(tfs.astype(np.uint64), starts)
        cd, dbufs = encode_blocks(dls.astype(np.uint64), starts)
        # block_seq = block index minus its group's first block index
        blk_first = np.empty(len(starts), dtype=bool)
        blk_first[0] = True
        blk_first[1:] = blk_grp[1:] != blk_grp[:-1]
        grp_blk0 = np.zeros(n_grp, dtype=np.int64)
        first_idx = np.flatnonzero(blk_first)
        grp_blk0[blk_grp[first_idx]] = first_idx
        blk_seq = np.arange(len(starts), dtype=np.int64) - grp_blk0[blk_grp]
        term_g = terms_arr[grp_first_row]
        bucket_g = np.asarray(
            [zlib.crc32(t.encode("utf-8")) % n_buckets for t in term_g],
            dtype=np.int32,
        )
        return pd.DataFrame(
            {
                "term": term_g[blk_grp],
                "salt": salts_arr[grp_first_row][blk_grp],
                "block_seq": blk_seq.astype(np.int32),
                "n": (ends - starts).astype(np.int32),
                "first_doc_id": ids[starts],
                "last_doc_id": ids[ends - 1],
                "max_score": max_scores,
                "codec_ids": np.asarray(ci, dtype=np.int32),
                "ids_enc": ebufs,
                "codec_tfs": np.asarray(ct, dtype=np.int32),
                "tfs_enc": tbufs,
                "codec_dls": np.asarray(cd, dtype=np.int32),
                "dls_enc": dbufs,
                "bucket": bucket_g[blk_grp],
            }
        )

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        held: pd.DataFrame | None = None  # trailing (possibly split) group
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if held is not None:
                pdf = pd.concat([held, pdf], ignore_index=True)
            t = pdf["term"].to_numpy(object)
            s = pdf["salt"].to_numpy()
            tail = (t == t[-1]) & (s == s[-1])
            if tail.all():  # whole batch is one group — keep accumulating
                held = pdf
                continue
            cut = len(pdf) - int(np.argmin(tail[::-1]))
            held = pdf.iloc[cut:].reset_index(drop=True)
            out = process(pdf.iloc[:cut].reset_index(drop=True))
            if len(out):
                yield out
        if held is not None and len(held):
            out = process(held)
            if len(out):
                yield out

    return fn


@dataclass
class IndexHandle:
    path: str
    version_dir: str
    stats: dict

    @property
    def postings_path(self) -> str:
        return os.path.join(self.version_dir, "postings")

    @property
    def terms_path(self) -> str:
        return os.path.join(self.version_dir, "terms")

    @property
    def docs_path(self) -> str:
        return os.path.join(self.version_dir, "docs")

    @property
    def metrics_path(self) -> str:
        return os.path.join(self.version_dir, "metrics")


def open_index(path: str, version: str | None = None) -> IndexHandle:
    """Open the current index version, or pin a historical snapshot
    (Iceberg `VERSION AS OF` analog — the snapshot log keeps every published
    version readable while new builds land; engine.publish)."""
    manifest = read_manifest(path, version=version)
    vdir = os.path.join(path, manifest["version"])
    with open(os.path.join(vdir, "stats.json")) as f:
        stats = json.load(f)
    return IndexHandle(path=path, version_dir=vdir, stats=stats)


def docs_changed_between(
    spark: SparkSession, path: str, from_version: str, to_version: str | None = None
) -> DataFrame:
    """Incremental read (A3 generalized / Iceberg incremental-scan analog):
    the docs added or whose content-bearing stats changed between two
    snapshots, keyed by url. A downstream consumer resuming from
    `from_version` re-processes exactly these rows. Change detection keys on
    the per-doc extracted-text fingerprint (docs.text_fp, a pure function of
    the text); doc_id is version-local and deliberately not compared."""
    old = open_index(path, from_version)
    new = open_index(path, to_version)
    old_docs = spark.read.parquet(old.docs_path).select(
        "url", F.col("text_fp").alias("_old_fp")
    )
    new_docs = spark.read.parquet(new.docs_path).select("url", "dl", "text_fp")
    joined = new_docs.join(old_docs, "url", "left")
    return joined.filter(
        F.col("_old_fp").isNull() | (F.col("_old_fp") != F.col("text_fp"))
    ).select(
        "url",
        "dl",
        F.when(F.col("_old_fp").isNull(), F.lit("added"))
        .otherwise(F.lit("changed"))
        .alias("change"),
    )


def build_index(
    spark: SparkSession,
    webpages: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    checkpoint_dir: str | None = None,
    dedup_latest: bool = True,
    use_html_fallback: bool = True,
) -> IndexHandle:
    """Full index build. See module docstring for the plan.

    checkpoint_dir enables both crash resume AND incremental reindex: the
    SPIMI stage keeps per-pid partials with input fingerprints, so
    rebuilding after the corpus changed re-tokenizes only the changed pids
    (the dominant stage at webtext scale) while stats/merge/publish run
    fresh — each build still publishes a complete new snapshot version.

    use_html_fallback=False drops the `html` binary column from the scan
    entirely (column pruning reaches the parquet reader) — the right setting
    when `text` is authoritative for every row; at Common-Crawl scale the
    html payload is the dominant IO."""
    cfg = cfg or IndexConfig()
    t0 = time.time()
    phases: dict[str, float] = {}

    # single corpus shuffle: partition by pid, sort so the newest crawl of
    # each url comes first; the fused mapInPandas then dedups, ranks and
    # builds SPIMI partials in one pass (see _fused_spimi docstring).
    P = cfg.n_build_partitions
    pre = webpages.withColumn(
        "pid", (F.crc32(F.encode(F.col("url"), "utf-8")) % P).cast("int")
    )
    if use_html_fallback and "html" in pre.columns:
        # ship the html payload only for rows that need the fallback —
        # extraction uses html iff text is null, and moving the (dominant)
        # binary column through Arrow for every row costs more than the
        # whole tokenize stage
        pre = pre.withColumn(
            "html", F.when(F.col("text").isNull(), F.col("html"))
        )
    input_cols = ["pid", "url", "text"]
    opt_cols = ("warc_ts", "html", "lang") if use_html_fallback else ("warc_ts", "lang")
    for opt in opt_cols:
        if opt in pre.columns:
            input_cols.append(opt)
    sort_keys = [F.asc("url")]
    if dedup_latest and "warc_ts" in pre.columns:
        # same full tie-break chain as latest_crawl (content hash last) so
        # the kept row is deterministic for any input row set
        sort_keys += [
            F.desc("warc_ts"), F.desc(F.length("text")), F.desc(F.md5("text"))
        ]
    spimi_input = (
        pre.select(*input_cols)
        .repartition(P, "pid")
        .sortWithinPartitions(*sort_keys)
    )
    partials_raw = spimi_input.mapInPandas(
        _fused_spimi(cfg, dedup_latest), schema=PARTIALS_SCHEMA
    )
    if checkpoint_dir:
        partials = _checkpointed_partials(
            spark, partials_raw, spimi_input, checkpoint_dir, cfg, dedup_latest
        )
    else:
        partials = partials_raw
    partials = partials.persist()

    doc_rows = partials.filter(F.col("term") == DOC_PSEUDO_TERM)
    term_partials = partials.filter(
        F.col("term") != DOC_PSEUDO_TERM
    ).select("pid", "term", "n", "tf_sum", "ids_enc", "tfs_enc", "dls_enc")

    # --- stage: stats (B5/B6): docmap rides the pseudo rows -----------------
    docs = doc_rows.select(
        F.col("pid"),
        F.explode(F.arrays_zip("doc_ids", "dls", "urls", "langs", "fps")).alias("z"),
    ).select(
        "pid",
        F.col("z.doc_ids").alias("doc_id"),
        F.col("z.dls").cast("int").alias("dl"),
        F.col("z.urls").alias("url"),
        F.col("z.langs").alias("lang"),
        F.col("z.fps").alias("text_fp"),
    ).persist()
    g = docs.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(g["n"]), float(g["avgdl"] or 0.0)
    phases["spimi_and_doc_stats"] = round(time.time() - t0, 3)

    terms = (
        term_partials.groupBy("term")
        .agg(F.sum("n").alias("df"), F.sum("tf_sum").alias("cf"))
    ).persist()

    hot_thr = cfg.hot_threshold(n_docs)
    range_size = cfg.range_size(n_docs)

    # --- stage: salted merge + compress (B7/B8) -----------------------------
    # The hot-term set (df >= max(min_hot_df, N/n_doc_ranges)) is bounded by
    # ~n_doc_ranges * avgdl terms at ANY corpus size, so it is collected
    # driver-side (<= a few thousand tiny rows) and shipped in the salt
    # closure — replacing the previous full-vocabulary df JOIN, which forced
    # the entire transit-encoded partials payload through an extra exchange
    # (guide §2.3: ship a few KB of metadata instead of re-shuffling the
    # heavy rows). Cold groups recover their df in the merge stage as their
    # own posting count, which is exact (one posting per containing doc).
    hot_df = {
        r["term"]: int(r["df"])
        for r in terms.filter(F.col("df") >= hot_thr)
        .select("term", "df")
        .collect()
    }
    salt_schema = T.StructType(
        [
            T.StructField("pid", T.IntegerType()),
            T.StructField("term", T.StringType()),
            T.StructField("salt", T.IntegerType()),
            T.StructField("df", T.LongType()),
            T.StructField("n", T.IntegerType()),
            T.StructField("ids_enc", T.BinaryType()),
            T.StructField("tfs_enc", T.BinaryType()),
            T.StructField("dls_enc", T.BinaryType()),
        ]
    )
    # Only HOT rows cross the Python boundary: cold partials (the vast
    # majority of the vocabulary) are a pure column-rename passthrough, so
    # they stay in the JVM — no Arrow round-trip for ~95% of the payload
    # (guide §4.1: pass only the rows/columns the function needs). The hot
    # set is small enough for an isin predicate (thousands of terms max).
    hot_terms = list(hot_df)
    cold_salted = (
        term_partials.filter(~F.col("term").isin(hot_terms))
        .select(
            "pid", "term", F.lit(0).cast("int").alias("salt"),
            F.lit(0).cast("long").alias("df"), "n",
            "ids_enc", "tfs_enc", "dls_enc",
        )
    )
    hot_salted = (
        term_partials.filter(F.col("term").isin(hot_terms))
        .select(
            "pid", "term", F.lit(0).cast("int").alias("salt"), "n",
            "ids_enc", "tfs_enc", "dls_enc",
        )
        .mapInPandas(_salt_split(cfg, range_size, hot_df), schema=salt_schema)
    )
    salted = cold_salted.unionByName(hot_salted) if hot_terms else cold_salted

    # ONE exchange for merge AND sink (guide §2.4): partition by the same
    # term bucket the postings table is laid out by on disk, sort by (term,
    # salt) within each bucket partition, and stream-merge — the write below
    # then needs no second repartition of the compressed blocks. Same
    # (term, salt) co-location as the previous repartition(term, salt), and
    # each task still compresses thousands of groups per Arrow batch in one
    # vectorized pass (see _merge_compress docstring). Within-bucket
    # parallelism is governed by n_term_buckets (raise it at cluster scale).
    postings = (
        salted.withColumn(
            "bucket",
            (
                F.crc32(F.encode(F.col("term"), "utf-8"))
                % cfg.n_term_buckets
            ).cast("int"),
        )
        .repartition(cfg.n_term_buckets, F.col("bucket"))
        .sortWithinPartitions("term", "salt")
        .drop("bucket")
        .mapInPandas(_merge_compress(cfg, n_docs, avgdl), schema=POSTINGS_SCHEMA)
    )

    # --- stage: per-partition lineage metrics (B15) --------------------------
    metrics = (
        term_partials.groupBy("pid")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("n").alias("n_postings"),
            F.sum("tf_sum").alias("n_tokens"),
        )
        .join(docs.groupBy("pid").agg(F.count("*").alias("n_docs")), "pid", "full")
    )

    # --- sinks + atomic publish (B9/A15) ------------------------------------
    def writer(vdir: str) -> dict:
        from concurrent.futures import ThreadPoolExecutor

        _t = time.time()

        def _postings_sink() -> None:
            # already bucket-partitioned by the merge exchange: the local
            # sort restores the exact on-disk row order (bucket, term, salt,
            # block_seq) and satisfies partitionBy's required ordering, so
            # no further exchange or writer-inserted sort is paid
            (
                postings.sortWithinPartitions(
                    "bucket", "term", "salt", "block_seq"
                )
                .write.partitionBy("bucket")
                .mode("overwrite")
                .parquet(os.path.join(vdir, "postings"))
            )
            phases["merge_compress_write"] = round(time.time() - _t, 3)
            # per-write-task byte/block metrics (B15: doc/term/byte
            # metrics): one row per term bucket = one written partition
            (
                spark.read.parquet(os.path.join(vdir, "postings"))
                .groupBy("bucket")
                .agg(
                    F.count("*").alias("n_blocks"),
                    F.sum("n").alias("n_postings"),
                    F.sum(
                        F.octet_length("ids_enc")
                        + F.octet_length("tfs_enc")
                        + F.octet_length("dls_enc")
                    ).alias("encoded_bytes"),
                )
                .write.mode("overwrite")
                .parquet(os.path.join(vdir, "bucket_metrics"))
            )

        def _terms_sink() -> None:
            terms.withColumn(
                "idf",
                F.log(
                    F.lit(1.0)
                    + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
                ),
            ).write.mode("overwrite").parquet(os.path.join(vdir, "terms"))

        def _docs_sink() -> None:
            docs.write.mode("overwrite").parquet(os.path.join(vdir, "docs"))

        def _metrics_sink() -> None:
            metrics.write.mode("overwrite").parquet(os.path.join(vdir, "metrics"))

        # the four sinks are independent jobs over already-persisted inputs:
        # submit them from a small thread pool so the small aux writes
        # back-fill executors idled by the postings write's task tail
        # (guide §2.6 overlap independent jobs) instead of running serially
        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(f)
                for f in (_postings_sink, _terms_sink, _docs_sink, _metrics_sink)
            ]
            for fu in futs:
                fu.result()
        phases["aux_writes"] = round(time.time() - _t, 3)
        stats = {
            "n_docs": n_docs,
            "avgdl": avgdl,
            "k1": cfg.k1,
            "b": cfg.b,
            "block_size": cfg.block_size,
            "n_build_partitions": cfg.n_build_partitions,
            "n_term_buckets": cfg.n_term_buckets,
            "n_doc_ranges": cfg.n_doc_ranges,
            "range_size": range_size,
            "hot_threshold": hot_thr,
            "build_seconds": time.time() - t0,
            "phase_seconds": phases,
        }
        with open(os.path.join(vdir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=2)
        return stats

    version_dir, stats = atomic_publish(index_dir, writer)
    if cfg.keep_snapshots is not None:
        # Iceberg-style retention from the build path (A15): prune committed
        # snapshots beyond the configured tail; orphan dirs are age-gated
        # inside expire_snapshots so a concurrent publish is never destroyed.
        from engine.publish import expire_snapshots

        expire_snapshots(index_dir, keep_last=cfg.keep_snapshots)
    partials.unpersist()
    docs.unpersist()
    terms.unpersist()
    return IndexHandle(path=index_dir, version_dir=version_dir, stats=stats)


def _pid_fingerprints(spimi_input: DataFrame) -> dict[int, int]:
    """Per-pid input CONTENT fingerprint: xxhash64 over every column that
    can change the pid's build output — url, warc_ts, the full text value
    (not its length: same-length edits must invalidate), the html payload
    (already masked upstream to the text-null rows that extraction actually
    reads, so this costs nothing extra), and lang — combined per pid with an
    order-insensitive but multiplicity-sensitive SUM mod 2^64 (xor would let
    a row added twice cancel back to the old fingerprint). Pure function of
    the pid's input multiset, independent of partitioning and row order.
    At 100 TB this reads the same columns the skipped tokenize pass would,
    minus the dominant html bytes for text-bearing rows — still a clear win
    for an incremental rebuild."""
    cols = [F.col("url")]
    if "warc_ts" in spimi_input.columns:
        cols.append(F.coalesce(F.col("warc_ts").cast("long"), F.lit(-1)))
    cols.append(F.coalesce(F.col("text"), F.lit("\x00<null-text>")))
    for opt in ("html", "lang"):
        if opt in spimi_input.columns:
            cols.append(F.coalesce(F.xxhash64(opt), F.lit(-1)))
    rows = (
        spimi_input.withColumn("_fp", F.xxhash64(*cols))
        .groupBy("pid")
        # decimal sum: overflow-safe regardless of ANSI mode; reduced mod
        # 2^64 driver-side (fingerprints are compared for equality only)
        .agg(F.sum(F.col("_fp").cast("decimal(38,0)")).alias("fp"))
        .collect()
    )
    return {int(r["pid"]): int(r["fp"]) % (1 << 64) for r in rows}


def _checkpointed_partials(
    spark: SparkSession,
    partials_raw: DataFrame,
    spimi_input: DataFrame,
    checkpoint_dir: str,
    cfg: IndexConfig,
    dedup_latest: bool = True,
) -> DataFrame:
    """Per-partition checkpointing + incremental reindex of the SPIMI stage
    (B15 / A3 [R] "incremental skip" generalized): partials are persisted
    partitioned by pid with a per-pid INPUT FINGERPRINT in the manifest. A
    re-run — whether resuming a killed build or rebuilding after the corpus
    changed — recomputes only pids whose fingerprint is absent or stale and
    reuses the checkpointed partials for the rest. Sound because a pid's
    partials (incl. its doc ids: rank within the pid's url set × P + pid)
    depend only on that pid's own input rows; global stats and the term
    merge run downstream over the full partials either way.

    Task retries are safe: changed pid directories are removed before the
    stage writes, and the manifest is committed only after the whole write
    succeeds."""
    import shutil

    os.makedirs(checkpoint_dir, exist_ok=True)
    ckpt_path = os.path.join(checkpoint_dir, "partials")
    manifest_path = os.path.join(checkpoint_dir, "_partials_manifest.json")
    manifest: dict = {}
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
    if manifest.get("n_build_partitions", cfg.n_build_partitions) != (
        cfg.n_build_partitions
    ):
        # P changed ⇒ every pid's content is redefined; start clean
        shutil.rmtree(ckpt_path, ignore_errors=True)
        manifest = {}
    cur_fps = _pid_fingerprints(spimi_input)
    prev_done = set(manifest.get("completed_pids", []))
    prev_fps = manifest.get("pid_fingerprints")
    all_pids = list(range(cfg.n_build_partitions))
    if prev_fps is None:  # pre-fingerprint manifest: trust completed set
        done = sorted(prev_done)
    else:
        done = sorted(
            p
            for p in prev_done
            if prev_fps.get(str(p)) == cur_fps.get(p)
        )
    missing = sorted(set(all_pids) - set(done))
    if missing:
        for p in missing:  # idempotent re-run of changed/stale pids
            shutil.rmtree(os.path.join(ckpt_path, f"pid={p}"), ignore_errors=True)
        todo = partials_raw
        if done:
            todo = (
                spimi_input.filter(~F.col("pid").isin(done))
                .mapInPandas(_fused_spimi(cfg, dedup_latest), schema=PARTIALS_SCHEMA)
            )
        todo.write.partitionBy("pid").mode("append").parquet(ckpt_path)
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "completed_pids": all_pids,
                    "pid_fingerprints": {
                        str(p): cur_fps[p] for p in cur_fps
                    },
                    "n_build_partitions": cfg.n_build_partitions,
                },
                f,
            )
        os.replace(tmp, manifest_path)
    out = spark.read.parquet(ckpt_path)
    # partitionBy moved pid to a partition column; restore column order/types
    return out.select(
        F.col("pid").cast("int"), "term", "n", "tf_sum",
        "ids_enc", "tfs_enc", "dls_enc",
        "doc_ids", "dls", "urls", "langs", "fps",
    )
