"""Training-data pipeline operators over the `documents` corpus:
deduplication (exact, shingle-Jaccard, MinHash+LSH, SimHash), text quality
scoring, token counting, language-ID, document fingerprinting.

These are first-class engine components for the 100 TB training-data use
case (driver brief): each has a `queries()` entry; the SQL-expressible ones
carry DuckDB oracles, the sketch-based ones are oracle-checked where the
sketch is exact-verified (MinHash candidates are re-verified with exact
Jaccard, so the output equals the exact result with overwhelming
probability) and rows-only otherwise.

All Python boundaries are Arrow-vectorized pandas UDFs (BASELINE.json:15).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from engine.relops import ORACLES, QUERIES, r4, register, t

# ---------------------------------------------------------------------------
# corpus-with-near-dups fixture (deterministic, shared by dedup entries):
# every doc_id < 50 gets a mutated copy (one token appended, id += 10000)
# ---------------------------------------------------------------------------

DUPS_SQL_CTE = """
WITH docs2 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 10000 AS doc_id, text || ' zzz' AS text
  FROM documents WHERE doc_id < 50
)
"""


def docs_with_neardups(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    mutated = (
        d.filter(F.col("doc_id") < 50)
        .withColumn("doc_id", F.col("doc_id") + 10000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" zzz")))
    )
    return d.unionByName(mutated)


# ---------------------------------------------------------------------------
# exact dedup (hash-groupBy)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """WITH dup AS (
         SELECT doc_id, text FROM documents
         UNION ALL
         SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0
       )
       SELECT md5(text) AS fp, count(*)::BIGINT AS n_copies,
              min(doc_id)::BIGINT AS keeper
       FROM dup GROUP BY md5(text) HAVING count(*) > 1""",
)
def dedup_exact(spark, sf_dir):
    """Exact dedup: md5-content groups with a deterministic keeper choice
    (min doc_id). A 100 TB run keeps only `keeper` rows via a semi-join."""
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.unionByName(
        d.filter(F.col("doc_id") % 7 == 0).withColumn(
            "doc_id", F.col("doc_id") + 10000
        )
    )
    return (
        dup.groupBy(F.md5("text").alias("fp"))
        .agg(F.count("*").alias("n_copies"), F.min("doc_id").alias("keeper"))
        .filter(F.col("n_copies") > 1)
    )


# ---------------------------------------------------------------------------
# shingle-Jaccard near-dup (exact, distributed via shingle-inverted join)
# ---------------------------------------------------------------------------

_JACCARD_SQL = (
    DUPS_SQL_CTE
    + """,
  toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
           generate_subscripts(string_split(text, ' '), 1) AS i
    FROM docs2),
  sh AS (
    SELECT DISTINCT a.doc_id, a.tok || ' ' || b.tok || ' ' || c.tok AS s
    FROM toks a
    JOIN toks b ON b.doc_id = a.doc_id AND b.i = a.i + 1
    JOIN toks c ON c.doc_id = a.doc_id AND c.i = a.i + 2),
  sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
  inter AS (
    SELECT x.doc_id AS a, y.doc_id AS b, count(*)::BIGINT AS i
    FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id)
SELECT inter.a, inter.b,
       round(inter.i * 1.0 / (sa.n + sb.n - inter.i), 4) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = inter.a
JOIN sizes sb ON sb.doc_id = inter.b
WHERE inter.i * 1.0 / (sa.n + sb.n - inter.i) >= 0.8"""
)


def _shingles(df: DataFrame, n: int = 3) -> DataFrame:
    """Distinct token n-gram shingles per doc: posexplode + self-equi-joins
    expressed as array ops (JVM-side, no Python)."""
    toks = df.withColumn("toks", F.split("text", " "))
    # shingle i = toks[i..i+2]; guard docs shorter than n (sequence would
    # otherwise count downwards)
    idx = F.when(
        F.size("toks") >= n, F.sequence(F.lit(0), F.size("toks") - n)
    ).otherwise(F.array().cast("array<int>"))
    sh = toks.withColumn(
        "shingle",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        ),
    ).select("doc_id", "shingle")
    return sh.distinct()


@register("dedup_jaccard_exact", _JACCARD_SQL)
def dedup_jaccard_exact(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (threshold 0.8): explode distinct
    shingles → inverted self-join on shingle → group pairs → |A∩B|/(|A|+|B|−∩).
    This is the scalable exact algorithm: the shingle join only materializes
    pairs that share ≥1 shingle."""
    sh = _shingles(docs_with_neardups(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = _pair_intersections(sh)  # skew-safe: hot shingles triangle-split
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .filter(j >= 0.8)
        .select("a", "b", F.round(j, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (sketch candidates, exact-verified)
# ---------------------------------------------------------------------------

N_PERM = 64
LSH_BANDS = 16  # 16 bands × 4 rows
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_A = _rng.randint(1, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
_B = _rng.randint(0, _MERSENNE, size=N_PERM, dtype=np.int64).astype(np.uint64)
# token→shingle rolling-hash multipliers and band-fold multipliers (odd ⇒
# bijective mod 2^64); all hashing is numeric so the whole batch vectorizes
_SH_MIX = np.uint64(0x9E3779B97F4A7C15)
_BAND_MIX = _rng.randint(1, 1 << 62, size=N_PERM // LSH_BANDS,
                         dtype=np.int64).astype(np.uint64) | np.uint64(1)

MINHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("band", T.IntegerType()),
        T.StructField("band_hash", T.LongType()),
    ]
)


def _flat_tokens(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(flat token array, tokens-per-doc) for a batch — one C-level split,
    no per-token Python."""
    lists = texts.str.split(" ")
    lens = lists.str.len().to_numpy(dtype=np.int64)
    flat = np.concatenate(
        [np.asarray(x, dtype=object) for x in lists]
    ) if len(lists) else np.empty(0, dtype=object)
    return flat, lens


def _token_hashes(flat: np.ndarray) -> np.ndarray:
    """64-bit hash per token: factorize the batch (each distinct string is
    hashed once — the vocabulary is tiny next to the token stream), crc32 the
    unique tokens, then gather. uint64, widened for mixing."""
    import zlib

    codes, uniq = pd.factorize(flat, sort=False)
    uh = np.asarray(
        [zlib.crc32(u.encode()) for u in uniq], dtype=np.uint64
    ) if len(uniq) else np.empty(0, dtype=np.uint64)
    return (uh * _SH_MIX)[codes] if len(flat) else np.empty(0, dtype=np.uint64)


def _doc_shingle_hashes(
    texts: pd.Series, n: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """(doc_index, shingle_hash) pairs — distinct per doc — for a batch,
    fully vectorized: rolling polynomial combine of per-token hashes, then a
    lexsort-dedup on (doc, hash)."""
    flat, lens = _flat_tokens(texts)
    th = _token_hashes(flat)
    doc_of = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    if len(th) < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    sh = th[: len(th) - n + 1].copy()
    for j in range(1, n):
        sh = sh * _SH_MIX + th[j : len(th) - n + 1 + j]
    valid = doc_of[: len(th) - n + 1] == doc_of[n - 1 :]
    docs = doc_of[: len(th) - n + 1][valid]
    sh = sh[valid]
    if len(sh) == 0:
        return docs, sh
    # distinct (doc, shingle) — MinHash is over the shingle *set*
    order = np.lexsort((sh, docs))
    docs, sh = docs[order], sh[order]
    keep = np.empty(len(sh), dtype=bool)
    keep[0] = True
    keep[1:] = (docs[1:] != docs[:-1]) | (sh[1:] != sh[:-1])
    return docs[keep], sh[keep]


# a join key shared by more ids than this is "hot": its pair generation is
# triangle-decomposed over HOT_SHINGLE_BUCKETS² join keys instead of one
HOT_SHINGLE_DF = 64
HOT_SHINGLE_BUCKETS = 8


def skew_safe_self_pairs(
    df: DataFrame,
    key_cols: list[str],
    id_col: str = "doc_id",
    hot_count: int = HOT_SHINGLE_DF,
    m: int = HOT_SHINGLE_BUCKETS,
) -> DataFrame:
    """All ordered id pairs (a < b) sharing a key — the candidate-generation
    self-join behind every LSH/blocking scheme here — made skew-safe: a key
    shared by d ids puts d² work on ONE reducer in a naive self-join (a
    stopword-grade shingle, a dense LSH bucket, a giant duplicate cluster).
    Keys above hot_count (a tiny broadcastable set) are triangle-decomposed:
    each side replicates across m hash buckets keyed by (key, p, q), pair
    (a, b) with id-hash buckets (p_a, q_b) matches exactly once at
    (key, p_a, q_b), and per-key cardinality drops to (d/m)² per side.
    Output: one (a, b) row per shared key occurrence (NOT distinct — caller
    counts or dedups), identical to the naive join's output multiset."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("_kdf"))
    hot = counts.filter(F.col("_kdf") > hot_count).select(*key_cols)
    # no broadcast hint: the hot set is usually tiny (AQE broadcasts it at
    # runtime), but it is bounded only by |rows|/hot_count — on a
    # pathological corpus Spark must be free to shuffle the semi-join
    cold_side = df.join(hot, key_cols, "left_anti")
    hot_side = df.join(hot, key_cols, "left_semi")
    # pmod, not abs-then-%: abs(Long.MIN_VALUE) overflows negative (or
    # throws under ANSI), which would put that id outside 0..m-1 and
    # silently drop every hot pair involving it (ADVICE r3)
    bkt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(m)).cast("int")
    seq = F.explode(F.sequence(F.lit(0), F.lit(m - 1)))
    hx = hot_side.withColumn("p", bkt).withColumn("q", seq)
    hy = hot_side.withColumn("q", bkt).withColumn("p", seq)
    key_eq = [F.col(f"x.{c}") == F.col(f"y.{c}") for c in key_cols]

    def pairs(left, right, extra):
        cond = key_eq[0]
        for c in key_eq[1:] + extra:
            cond = cond & c
        cond = cond & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        return left.alias("x").join(right.alias("y"), cond).select(
            F.col(f"x.{id_col}").alias("a"), F.col(f"y.{id_col}").alias("b")
        )

    hot_matches = pairs(
        hx, hy, [F.col("x.p") == F.col("y.p"), F.col("x.q") == F.col("y.q")]
    )
    cold_matches = pairs(cold_side, cold_side, [])
    return cold_matches.unionByName(hot_matches)


def _pair_intersections(sh: DataFrame) -> DataFrame:
    """Exact per-pair shared-shingle counts (a < b) from a (doc_id, shingle)
    table via the skew-safe self-join. Counts are identical to the naive
    join — the exact-Jaccard oracle is unchanged."""
    return (
        skew_safe_self_pairs(sh, ["shingle"], "doc_id")
        .groupBy("a", "b")
        .agg(F.count("*").alias("i"))
    )


def _minhash_bands(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """MinHash(64) → 16 LSH band keys per doc. No per-doc Python: shingle
    hashing is a vectorized rolling hash over the batch's flattened token
    stream, signatures are a segment-min (np.minimum.reduceat over doc
    boundaries), band keys fold the 4 rows numerically."""
    rows_per_band = N_PERM // LSH_BANDS
    for pdf in batches:
        if len(pdf) == 0:
            continue
        docs, sh = _doc_shingle_hashes(pdf["text"])
        if len(sh) == 0:
            continue
        # (shingles × perms) universal hashes, min per doc segment
        hv = (sh[:, None] * _A[None, :] + _B[None, :]) % _MERSENNE
        starts = np.flatnonzero(
            np.concatenate(([True], docs[1:] != docs[:-1]))
        )
        sig = np.minimum.reduceat(hv, starts, axis=0)  # (n_docs_with_sh, 64)
        doc_ids = pdf["doc_id"].to_numpy(np.int64)[docs[starts]]
        # fold each band's rows into one 64-bit key (odd-multiplier mix)
        bands = sig.reshape(len(sig), LSH_BANDS, rows_per_band)
        band_hash = (bands * _BAND_MIX[None, None, :]).sum(
            axis=2, dtype=np.uint64
        )
        n, nb = band_hash.shape
        yield pd.DataFrame(
            {
                "doc_id": np.repeat(doc_ids, nb),
                "band": np.tile(np.arange(nb, dtype=np.int32), n),
                "band_hash": band_hash.reshape(-1).view(np.int64),
            }
        )


@register("dedup_minhash_lsh", _JACCARD_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash(64) + LSH(16×4) candidate generation, exact-Jaccard verified:
    band-bucket self-join yields candidate pairs (recall ≈ 1 − (1−j⁴)¹⁶ —
    >0.9999 at j≥0.8); candidates are re-verified with the exact shingle
    Jaccard, so the output matches the exact oracle.

    The sketch must bound the expensive join for the 100 TB claim to hold:
    the shingle table is semi-joined down to candidate doc ids (both pair
    sides) *before* the shingle self-join, so the self-join runs over the
    candidate subcorpus only — at web scale that is ~duplicate-cluster-sized,
    not corpus-sized. A final pair-level semi keeps exactly the LSH pairs."""
    docs = docs_with_neardups(spark, sf_dir)
    bands = docs.mapInPandas(_minhash_bands, MINHASH_SCHEMA)
    # dense LSH buckets (giant duplicate clusters) are triangle-split too
    cand = skew_safe_self_pairs(
        bands, ["band", "band_hash"], "doc_id"
    ).distinct()
    cand_ids = (
        cand.select(F.col("a").alias("doc_id"))
        .union(cand.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    # exact verification over candidate docs only: the semi-join sits BELOW
    # the self-join (asserted by tests/test_scale_plans.py)
    sh = _shingles(docs).join(cand_ids, "doc_id", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        _pair_intersections(sh)
        .join(cand, ["a", "b"], "left_semi")
    )
    sa = sizes.select(F.col("doc_id").alias("a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("b"), F.col("n").alias("nb"))
    j = F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "a")
        .join(sb, "b")
        .filter(j >= 0.8)
        .select("a", "b", F.round(j, 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash near-dup (no SQL oracle — rows-only + pytest vs jaccard pairs)
# ---------------------------------------------------------------------------

SIMHASH_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("simhash", T.LongType()),
    ]
)


def _simhash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """SimHash(64) per doc, vectorized across the batch: unique tokens are
    hashed once (factorize), the ±1 bit votes are summed per doc segment
    with np.add.reduceat, and the sign vector packs back into one int64 —
    no per-doc Python loop."""
    import zlib

    for pdf in batches:
        if len(pdf) == 0:
            continue
        flat, lens = _flat_tokens(pdf["text"])
        if len(flat) == 0:
            continue
        codes, uniq = pd.factorize(flat, sort=False)
        uh = np.asarray(
            [
                zlib.crc32(w.encode()) | (zlib.crc32(w[::-1].encode()) << 32)
                for w in uniq
            ],
            dtype=np.uint64,
        )
        hv = uh[codes]
        nonempty = lens > 0
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1][nonempty]
        seg_lens = lens[nonempty].astype(np.int64)
        # one vectorized pass per bit plane (64 × O(n_tokens) — bounded
        # memory regardless of batch size): votes_k = 2·ones_k − len
        sh = np.zeros(len(starts), dtype=np.uint64)
        for kbit in range(64):
            ones = np.add.reduceat(
                ((hv >> np.uint64(kbit)) & np.uint64(1)).astype(np.int64),
                starts,
            )
            sh |= ((2 * ones - seg_lens) > 0).astype(np.uint64) << np.uint64(
                kbit
            )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(np.int64)[nonempty],
                "simhash": sh.view(np.int64),
            }
        )


@register("dedup_simhash")  # rows-only: hamming-ball search isn't ANSI SQL
def dedup_simhash(spark, sf_dir):
    """SimHash(64) near-dup pairs with hamming distance ≤ 8, found via
    4-way band blocking (two near-dups at d≤8 share ≥1 of 8 8-bit bands...
    we use 8 bands of 8 bits: d≤7 guarantees a shared band; d=8 may miss —
    bounded, documented). Verified against jaccard pairs in pytest."""
    docs = docs_with_neardups(spark, sf_dir)
    sh = docs.mapInPandas(_simhash, SIMHASH_SCHEMA)
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * 8).bitwiseAND(0xFF).alias("key"),
                    )
                    for i in range(8)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", "bk.band", "bk.key")
    cand = (
        skew_safe_self_pairs(bands, ["band", "key"], "doc_id")
        .distinct()
        .join(sh.select(F.col("doc_id").alias("a"),
                        F.col("simhash").alias("ha")), "a")
        .join(sh.select(F.col("doc_id").alias("b"),
                        F.col("simhash").alias("hb")), "b")
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cand.filter(dist <= 8).select(
        "a", "b", dist.cast("int").alias("hamming")
    )


# ---------------------------------------------------------------------------
# text quality / token counting / fingerprint (SQL-oracled)
# ---------------------------------------------------------------------------


@register(
    "text_token_count",
    """SELECT doc_id, len(string_split(text, ' '))::INT AS n_tokens,
              n_chars::BIGINT AS n_chars
       FROM documents""",
)
def text_token_count(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.col("n_chars"),
    )


@register(
    "text_quality",
    """SELECT doc_id,
              len(string_split(text, ' '))::INT AS n_tokens,
              round((length(text) - length(replace(text, 'the', ''))) / 3.0
                    / len(string_split(text, ' ')), 4) AS stopword_ratio,
              round((length(text) - len(string_split(text, ' ')) + 1) * 1.0
                    / len(string_split(text, ' ')), 4) AS avg_token_len,
              (len(string_split(text, ' ')) BETWEEN 20 AND 80) AS len_ok
       FROM documents""",
)
def text_quality(spark, sf_dir):
    """Quality signals a webtext filter would gate on: stopword ratio, mean
    token length, length-window flag (C4/Gopher-style heuristics)."""
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    stop = (F.length("text") - F.length(F.regexp_replace("text", "the", ""))) / 3.0
    return d.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop / n_tok, 4).alias("stopword_ratio"),
        F.round((F.length("text") - n_tok + 1) / n_tok, 4).alias("avg_token_len"),
        n_tok.between(20, 80).alias("len_ok"),
    )


@register(
    "text_token_count_bpe",
    r"""SELECT doc_id,
               len(regexp_extract_all(text, '[a-z]+|[0-9]|[^a-z0-9 ]'))::INT
                   AS n_bpe_tokens,
               len(string_split(text, ' '))::INT AS n_ws_tokens
        FROM documents""",
)
def text_token_count_bpe(spark, sf_dir):
    """BPE-ish regex tokenizer count (letter runs | single digits | other
    non-space) next to the whitespace count — the pre-tokenization a
    training-data pipeline budgets with. Pattern kept to a dialect-neutral
    subset so Spark (Java regex) and the DuckDB oracle (RE2) agree."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+|[0-9]|[^a-z0-9 ]"), 0))
        .alias("n_bpe_tokens"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
    )


@register(
    "text_quality_filter",
    """SELECT doc_id FROM (
         SELECT doc_id, length(text) AS n_chr,
                len(string_split(text, ' ')) AS n_tok,
                (length(text) - length(replace(text, 'the', ''))) / 3.0 AS n_the
         FROM documents)
       WHERE n_tok BETWEEN 20 AND 80
         AND n_the / n_tok BETWEEN 0.001 AND 0.2
         AND (n_chr * 1.0 / n_tok) BETWEEN 3 AND 12""",
)
def text_quality_filter(spark, sf_dir):
    """The C4/Gopher-style gate itself: keep docs passing the length window,
    stopword-ratio band, and mean-token-length band — the row-level filter a
    100 TB cleaning pass applies before training. Pure JVM column ops."""
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split("text", " "))
    n_the = (F.length("text") - F.length(F.regexp_replace("text", "the", ""))) / 3.0
    return d.filter(
        n_tok.between(20, 80)
        & (n_the / n_tok).between(0.001, 0.2)
        & (F.length("text") / n_tok).between(3, 12)
    ).select("doc_id")


@register(
    "doc_fingerprint",
    """SELECT doc_id, md5(text) AS fp,
              substring(md5(text), 1, 8) AS fp_prefix
       FROM documents""",
)
def doc_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("fp"),
        F.substring(F.md5("text"), 1, 8).alias("fp_prefix"),
    )


# ---------------------------------------------------------------------------
# language ID (char-trigram profile heuristic — rows-only check)
# ---------------------------------------------------------------------------

LANGID_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang_pred", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)

# Profiles are GENERATED at import from embedded public-domain training
# text: the Universal Declaration of Human Rights, Article 1, in each
# language — the standard reference corpus for language-ID experiments
# (Cavnar & Trenkle-style char-n-gram profiling). Reproducible and
# dependency-free; no hand-tuned gram lists.
_LANGID_TRAIN = {
    "en": "all human beings are born free and equal in dignity and rights "
          "they are endowed with reason and conscience and should act "
          "towards one another in a spirit of brotherhood",
    # de/nl are the closest pair in the set; both get UDHR Article 2 as
    # well so the profiles separate on function words (das/war/nach/oder
    # vs het/van/ook/zoals)
    "de": "alle menschen sind frei und gleich an würde und rechten geboren "
          "sie sind mit vernunft und gewissen begabt und sollen einander im "
          "geist der brüderlichkeit begegnen "
          "jeder hat anspruch auf alle in dieser erklärung verkündeten "
          "rechte und freiheiten ohne irgendeinen unterschied etwa nach "
          "rasse hautfarbe geschlecht sprache religion politischer oder "
          "sonstiger anschauung "
          "da die anerkennung der angeborenen würde und der gleichen und "
          "unveräußerlichen rechte aller mitglieder der gemeinschaft der "
          "menschen die grundlage von freiheit gerechtigkeit und frieden "
          "in der welt bildet da die nichtanerkennung und verachtung der "
          "menschenrechte zu akten der barbarei geführt haben die das "
          "gewissen der menschheit mit empörung erfüllen",
    "fr": "tous les êtres humains naissent libres et égaux en dignité et en "
          "droits ils sont doués de raison et de conscience et doivent agir "
          "les uns envers les autres dans un esprit de fraternité",
    "es": "todos los seres humanos nacen libres e iguales en dignidad y "
          "derechos y dotados como están de razón y conciencia deben "
          "comportarse fraternalmente los unos con los otros",
    "it": "tutti gli esseri umani nascono liberi ed eguali in dignità e "
          "diritti essi sono dotati di ragione e di coscienza e devono "
          "agire gli uni verso gli altri in spirito di fratellanza",
    "pt": "todos os seres humanos nascem livres e iguais em dignidade e em "
          "direitos dotados de razão e de consciência devem agir uns para "
          "com os outros em espírito de fraternidade",
    "nl": "alle mensen worden vrij en gelijk in waardigheid en rechten "
          "geboren zij zijn begiftigd met verstand en geweten en behoren "
          "zich jegens elkander in een geest van broederschap te gedragen "
          "een ieder heeft aanspraak op alle rechten en vrijheden in deze "
          "verklaring opgesomd zonder enig onderscheid van welke aard ook "
          "zoals ras kleur geslacht taal godsdienst politieke of andere "
          "overtuiging "
          "overwegende dat erkenning van de inherente waardigheid en van "
          "de gelijke en onvervreemdbare rechten van alle leden van de "
          "mensengemeenschap grondslag is voor de vrijheid gerechtigheid "
          "en vrede in de wereld overwegende dat terzijdestelling van en "
          "minachting voor de rechten van de mens geleid hebben tot "
          "barbaarse handelingen die het geweten van de mensheid geweld "
          "hebben aangedaan",
    "ru": "все люди рождаются свободными и равными в своем достоинстве и "
          "правах они наделены разумом и совестью и должны поступать в "
          "отношении друг друга в духе братства",
    "zh": "人人生而自由 在尊严和权利上一律平等 他们赋有理性和良心 并应以兄弟关系的精神相对待",
}

_TRI_P = (np.uint64(0x100000001B3), np.uint64(0x9E3779B97F4A7C15),
          np.uint64(0xC2B2AE3D27D4EB4F))
_UNI_P = np.uint64((0x100000001B3 * 0x9E3779B97F4A7C15) % (1 << 64))


def _ngram_hashes(s: str) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, start positions) of all char 1-, 2- and 3-grams, one
    vectorized pass per order (UTF-32 view → rolling polynomial mod 2^64).
    Unigrams and bigrams carry most of the signal for CJK scripts (Cavnar &
    Trenkle use 1..5-grams for the same reason); the three orders use
    disjoint mixer sets so an n-gram never collides with a
    different-order one."""
    c = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    parts = [c * _UNI_P]
    pos = [np.arange(len(c), dtype=np.int64)]
    if len(c) >= 2:
        parts.append(c[:-1] * _TRI_P[1] + c[1:] * _TRI_P[2])
        pos.append(np.arange(len(c) - 1, dtype=np.int64))
    if len(c) >= 3:
        parts.append(c[:-2] * _TRI_P[0] + c[1:-1] * _TRI_P[1] + c[2:] * _TRI_P[2])
        pos.append(np.arange(len(c) - 2, dtype=np.int64))
    return np.concatenate(parts), np.concatenate(pos)


def _build_profiles(train: dict[str, str]) -> dict[str, tuple]:
    """lang → (sorted n-gram hashes, tf-idf weights): relative in-language
    frequency × log(n_langs / df). The log idf zeroes n-grams present in
    EVERY profile (spaces, universal latin vowels) — without it those few
    high-frequency grams decide close pairs (measured: de-vs-nl margins
    were carried entirely by ' ' and 'e')."""
    raw = {}
    for lang, txt in train.items():
        tri, _ = _ngram_hashes(" " + " ".join(txt.split()) + " ")
        hashes, counts = np.unique(tri, return_counts=True)
        raw[lang] = (hashes, counts.astype(np.float64) / counts.sum())
    df: dict[int, int] = {}
    for hashes, _w in raw.values():
        for h in hashes.tolist():
            df[h] = df.get(h, 0) + 1
    n_langs = len(raw)
    out = {}
    for lang, (hashes, w) in raw.items():
        idf = np.log(
            n_langs
            / np.asarray([df[h] for h in hashes.tolist()], dtype=np.float64)
        )
        out[lang] = (hashes, w * idf)
    return out


_PROFILES = _build_profiles(_LANGID_TRAIN)


def _langid(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Char-trigram profile scores, vectorized: ONE trigram-hash pass over
    the batch's concatenated text, then one sorted-array lookup per language
    (searchsorted against its profile) and a bincount per doc segment — no
    per-doc or per-gram Python loop."""
    langs_sorted = sorted(_PROFILES)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        low = pdf["text"].fillna("").str.lower()
        n = len(low)
        # one concatenated pass; \x00 separators make doc-spanning trigrams
        # unmatchable (profiles never contain \x00), so they score 0
        joined = "\x00".join(low)
        tri, tri_pos = _ngram_hashes(joined)
        lens = low.str.len().to_numpy(np.int64)
        doc_starts = np.concatenate(([0], np.cumsum(lens + 1)))[:-1]
        doc_of_tri = np.searchsorted(doc_starts, tri_pos, side="right") - 1
        scores = np.zeros((n, len(langs_sorted)), dtype=np.float64)
        for li, lang in enumerate(langs_sorted):
            h, w = _PROFILES[lang]
            idx = np.searchsorted(h, tri).clip(0, len(h) - 1)
            hitw = np.where(h[idx] == tri, w[idx], 0.0)
            scores[:, li] = np.bincount(doc_of_tri, weights=hitw, minlength=n)
        total = np.maximum(scores.sum(axis=1), 1e-12)
        # argmax with first-wins (lowest lang name) tie-break
        best = scores.argmax(axis=1)
        conf = np.round(scores[np.arange(n), best] / total, 4)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].to_numpy(np.int64),
                "lang_pred": np.asarray(langs_sorted, dtype=object)[best],
                "confidence": conf,
            }
        )


@register("text_langid")  # heuristic — rows-only check
def text_langid(spark, sf_dir):
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInPandas(_langid, LANGID_SCHEMA)
