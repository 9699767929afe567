"""Similarity search over the `embeddings` table (array<float>, dim 64).

- brute-force cosine top-k: JVM-side higher-order functions (zip_with /
  aggregate) — the exactness baseline, SQL-oracled vs DuckDB
  list_cosine_similarity.
- LSH-bucketed ANN (random hyperplanes): the scale path — candidates come
  from multi-probe signature buckets, then exact re-rank. Recall measured in
  pytest against brute force (rows-only driver check).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from engine.relops import register, t

QUERY_VEC_ID = 0
_ANN_SQL = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_VEC_ID})
SELECT e.vec_id,
       round(list_cosine_similarity(
           list_transform(e.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(q.qv, x -> CAST(x AS DOUBLE))), 4) AS cosine
FROM embeddings e, q
WHERE e.vec_id <> {QUERY_VEC_ID}
ORDER BY cosine DESC, e.vec_id
LIMIT 10
"""


def _cosine_col(qv: list[float]):
    qarr = F.array(*[F.lit(float(x)) for x in qv])
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(dbl, qarr, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    n1 = F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x))
    n2 = float(np.sqrt(np.sum(np.asarray(qv, dtype=np.float64) ** 2)))
    return dot / (n1 * F.lit(n2))


def cosine_topk_df(e: DataFrame, qv: list[float], k: int = 10,
                   exclude_id: int | None = None) -> DataFrame:
    """Brute-force cosine top-k over any (vec_id, embedding) DataFrame,
    computed entirely with JVM higher-order functions — no Python in the
    scan. The exactness baseline."""
    if exclude_id is not None:
        e = e.filter(F.col("vec_id") != exclude_id)
    return (
        e.select("vec_id", F.round(_cosine_col(qv), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


@register("ann_cosine_topk", _ANN_SQL)
def ann_cosine_topk(spark, sf_dir):
    e = t(spark, sf_dir, "embeddings")
    qv = (
        e.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select("embedding")
        .collect()[0][0]
    )
    return cosine_topk_df(e, qv, 10, exclude_id=QUERY_VEC_ID)


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path): banded multi-table random-hyperplane index.
#
# T=4 independent tables × B=16 planes each. A neighbor is a candidate if it
# matches the query's signature (within ≤2 flipped bits, multi-probe) in ANY
# table — banding drives recall exponentially with T while per-bucket
# occupancy stays N/2^B per table. The signature table is built ONCE and
# persisted (partitioned by table, sig-sorted within files), so a query
# touches only its ~4×137 probed buckets via partition/row-group pruning —
# never a full-corpus scan. At 10^9 vectors: E[bucket] ≈ 15k vectors,
# candidate set ≈ 0.5-1% of the corpus, re-ranked exactly.
# ---------------------------------------------------------------------------

N_TABLES = 4
N_PLANES = 16
_rng = np.random.RandomState(7)
_PLANES = _rng.standard_normal((N_TABLES, N_PLANES, 64))

SIG_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("sig", T.IntegerType()),
    ]
)


def _signatures(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """N_TABLES signature rows per vector, vectorized per Arrow batch."""
    weights = (1 << np.arange(N_PLANES)).astype(np.int64)
    for pdf in batches:
        if len(pdf) == 0:
            continue
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        ids = pdf["vec_id"].to_numpy(np.int64)
        parts = []
        for tb in range(N_TABLES):
            bits = (mat @ _PLANES[tb].T) > 0  # (n, planes)
            sigs = bits.astype(np.int64) @ weights
            parts.append(
                pd.DataFrame(
                    {
                        "vec_id": ids,
                        "table": np.full(len(ids), tb, dtype=np.int32),
                        "sig": sigs.astype(np.int32),
                    }
                )
            )
        yield pd.concat(parts, ignore_index=True)


def ann_signatures(e: DataFrame) -> DataFrame:
    return e.select("vec_id", "embedding").mapInPandas(_signatures, SIG_SCHEMA)


def build_ann_index(spark: SparkSession, e: DataFrame, path: str) -> str:
    """Persist the signature index: partitioned by table (partition pruning),
    sig-sorted within files (parquet min/max row-group pruning on sig)."""
    (
        ann_signatures(e)
        .repartition("table")
        .sortWithinPartitions("sig")
        .write.partitionBy("table")
        .mode("overwrite")
        .parquet(path)
    )
    return path


def _probe_sigs(qv: np.ndarray, table: int, n_probe_bits: int = 2) -> list[int]:
    """Multi-probe set for one table: the query's bucket plus every bucket
    within hamming distance ≤ n_probe_bits (exhaustive flips; margin-ordered
    probing would trim this further at the same recall)."""
    base = int(
        ((qv @ _PLANES[table].T) > 0).astype(np.int64)
        @ (1 << np.arange(N_PLANES))
    )
    sigs = {base}
    for i in range(N_PLANES):
        sigs.add(base ^ (1 << i))
        if n_probe_bits >= 2:
            for j in range(i + 1, N_PLANES):
                sigs.add(base ^ (1 << i) ^ (1 << j))
    return sorted(sigs)


def _probe_filter(qv: np.ndarray, n_probe_bits: int = 2):
    cond = None
    for tb in range(N_TABLES):
        c = (F.col("table") == tb) & F.col("sig").isin(
            _probe_sigs(qv, tb, n_probe_bits)
        )
        cond = c if cond is None else (cond | c)
    return cond


def ann_topk(
    spark: SparkSession,
    e: DataFrame,
    sigs: DataFrame | str,
    qv: np.ndarray,
    k: int = 10,
    exclude_id: int | None = None,
    n_probe_bits: int = 2,
) -> DataFrame:
    """ANN top-k: candidates from the probed buckets of the signature index
    (persisted path or DataFrame), exact cosine re-rank of candidates only."""
    sig_df = (
        spark.read.parquet(sigs) if isinstance(sigs, str) else sigs
    )
    cand_ids = (
        sig_df.filter(_probe_filter(qv, n_probe_bits))
        .select("vec_id")
        .distinct()
    )
    cands = e.join(cand_ids, "vec_id", "left_semi")
    if exclude_id is not None:
        cands = cands.filter(F.col("vec_id") != exclude_id)
    return (
        cands.select("vec_id", F.round(_cosine_col(qv.tolist()), 4).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def lsh_topk_df(e: DataFrame, qv: np.ndarray, k: int = 10,
                exclude_id: int | None = None) -> DataFrame:
    """Convenience one-shot path (signatures computed inline — tests and
    ad-hoc use); production queries go through build_ann_index + ann_topk."""
    spark = e.sparkSession
    return ann_topk(spark, e, ann_signatures(e), qv, k, exclude_id)


_ANN_INDEX_CACHE: dict[str, str] = {}


@register("ann_lsh_topk")  # approximate — rows-only; recall tested in pytest
def ann_lsh_topk(spark, sf_dir):
    """Queries the PERSISTED signature index (built once per corpus): the
    per-query work is a probe-bucket-pruned scan of the signature table plus
    an exact re-rank of the candidates — no full-corpus pass."""
    import tempfile

    e = t(spark, sf_dir, "embeddings")
    if sf_dir not in _ANN_INDEX_CACHE:
        _ANN_INDEX_CACHE[sf_dir] = build_ann_index(
            spark, e, tempfile.mkdtemp(prefix="drv_ann_")
        )
    qv = np.asarray(
        e.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").collect()[0][0],
        dtype=np.float64,
    )
    return ann_topk(
        spark, e, _ANN_INDEX_CACHE[sf_dir], qv, 10, exclude_id=QUERY_VEC_ID
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-duplicate pairs (dedup family — the embedding-space
# analog of MinHash text dedup). Candidates from LSH signature buckets,
# exact cosine verification — output equals the exact pairwise result for
# thresholds high enough that near-dups collide in at least one probe.
# ---------------------------------------------------------------------------

_EMB_DUP_SQL = """
WITH emb2 AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, embedding FROM embeddings WHERE vec_id < 50
)
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(
           list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
           list_transform(b.embedding, x -> CAST(x AS DOUBLE))), 4) AS cosine
FROM emb2 a JOIN emb2 b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(
          list_transform(a.embedding, x -> CAST(x AS DOUBLE)),
          list_transform(b.embedding, x -> CAST(x AS DOUBLE))) >= 0.99
"""


@register("dedup_embedding_cosine", _EMB_DUP_SQL)
def dedup_embedding_cosine(spark, sf_dir):
    """Exact-copy embeddings planted (vec_id < 50 duplicated at +10000);
    LSH-bucketed candidate pairs (identical vectors share every bucket),
    exact cosine ≥ 0.99 verification. The oracle computes the exact pairwise
    answer; LSH recall is 1.0 for identical vectors by construction."""
    e = t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dup = e.unionByName(
        e.filter(F.col("vec_id") < 50).withColumn(
            "vec_id", F.col("vec_id") + 10000
        )
    )
    sigs = ann_signatures(dup)
    l = sigs.alias("l")
    r = sigs.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.table") == F.col("r.table"))
            & (F.col("l.sig") == F.col("r.sig"))
            & (F.col("l.vec_id") < F.col("r.vec_id")),
        )
        .select(F.col("l.vec_id").alias("a"), F.col("r.vec_id").alias("b"))
        .distinct()
    )
    ea = dup.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    eb = dup.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    da = F.transform("va", lambda x: x.cast("double"))
    db_ = F.transform("vb", lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db_, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(db_, F.lit(0.0), lambda acc, x: acc + x * x))
    cos = dot / (na * nb)
    return (
        cand.join(ea, "a")
        .join(eb, "b")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.99)
        .select("a", "b", F.round("cosine", 4).alias("cosine"))
    )
