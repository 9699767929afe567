"""Relational operator surface (SURVEY.md §2.C) — driver-verified queries.

Every entry here ships as a ``queries()`` callable plus a matching
``oracle_sql()`` DuckDB statement (driver contract, __spark_entry__.py).
Naming rule: every computed column is aliased identically on both sides;
double aggregates are rounded identically (big sums → 2dp, avgs/ratios →
4dp) so cross-engine float summation order can't flip the value hash.
Timestamps are reduced to epoch seconds (bigint) where they appear in
results — immune to session-timezone differences.

Reference anchors are noted per operator (SURVEY.md §2.A/§2.C); the
reference has no general relational engine — these generalize its pipeline
idioms (filter A5, anti-join A6, nested agg A8, dedup A9, conditional flags
A10, explode-flatten A14, facet counts A16) over the driver's fixture star
schema.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def r2(c):  # big-sum rounding
    return F.round(c, 2)


def r4(c):  # avg/ratio rounding
    return F.round(c, 4)


# ---------------------------------------------------------------------------
# Scans / projection / filters (A5 [R] generalized)
# ---------------------------------------------------------------------------


@register(
    "scan_project_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
       FROM lineitem WHERE l_quantity > 45""",
)
def scan_project_filter(spark, sf_dir):
    # predicate + projection pushed to the parquet scan (asserted in tests)
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@register(
    "filter_predicates",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders
       WHERE o_orderstatus = 'F'
         AND o_totalprice BETWEEN 1000 AND 150000
         AND o_orderpriority IN ('1-URGENT', '2-HIGH')
         AND o_orderkey % 2 = 0""",
)
def filter_predicates(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & F.col("o_totalprice").between(1000, 150000)
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_orderkey") % 2 == 0)
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@register(
    "filter_string_ops",
    """SELECT c_custkey, c_name
       FROM customer
       WHERE lower(c_mktsegment) IN ('automobile', 'building')
         AND c_name LIKE '%1%'
         AND regexp_matches(c_name, '\\d$')
         AND c_name IS NOT NULL""",
)
def filter_string_ops(spark, sf_dir):
    # case-insensitive membership (A5 [R]) + like + rlike + null guard
    c = t(spark, sf_dir, "customer")
    return c.filter(
        F.lower(F.col("c_mktsegment")).isin("automobile", "building")
        & F.col("c_name").like("%1%")
        & F.col("c_name").rlike(r"\d$")
        & F.col("c_name").isNotNull()
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "join_broadcast_dims",
    """SELECT r.r_name, count(*)::BIGINT AS n_cust,
              round(avg(c.c_acctbal), 4) AS avg_bal
       FROM customer c
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       GROUP BY r.r_name""",
)
def join_broadcast_dims(spark, sf_dir):
    # dims broadcast explicitly (B11 analog; SURVEY.md §2.C joins)
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_cust"), r4(F.avg("c_acctbal")).alias("avg_bal"))
    )


@register(
    "join_smj_fact",
    """SELECT o.o_orderpriority,
              round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
              count(*)::BIGINT AS n_items
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       GROUP BY o.o_orderpriority""",
)
def join_smj_fact(spark, sf_dir):
    # fact-fact shuffle join. The SHUFFLE_HASH hint (guide §3.1) keeps the
    # planner from broadcasting the column-pruned orders side: building and
    # shipping a 1.5M-row hash relation is single-threaded driver work that
    # measured slower (1.9 s) than the 32-way shuffled hash join (1.3 s);
    # orders (the smaller side) is the per-partition build side, and no
    # sort is paid on the 6M-row lineitem side.
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    return (
        o.hint("shuffle_hash").join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            r2(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "join_left_outer",
    """SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS n_orders
       FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey""",
)
def join_left_outer(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "join_full_outer",
    """SELECT coalesce(a.k, b.k) AS k, a.n_f, b.n_o
       FROM (SELECT o_custkey AS k, count(*)::BIGINT AS n_f FROM orders
             WHERE o_orderstatus='F' GROUP BY 1) a
       FULL JOIN (SELECT o_custkey AS k, count(*)::BIGINT AS n_o FROM orders
             WHERE o_orderstatus='O' GROUP BY 1) b ON a.k = b.k""",
)
def join_full_outer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = (
        o.filter(F.col("o_orderstatus") == "F")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_f"))
    )
    b = (
        o.filter(F.col("o_orderstatus") == "O")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count("*").alias("n_o"))
    )
    return a.join(b, "k", "full").select(
        F.col("k"), F.col("n_f"), F.col("n_o")
    )


@register(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
)
def join_semi(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""",
)
def join_anti(spark, sf_dir):
    # the reference's redaction anti-join (A6 [R]: drop redacted bundle ids)
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_theta",
    """SELECT r.r_name, count(*)::BIGINT AS n_other
       FROM nation n JOIN region r ON n.n_regionkey <> r.r_regionkey
       GROUP BY r.r_name""",
)
def join_theta(spark, sf_dir):
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        n.join(r, n.n_regionkey != r.r_regionkey)
        .groupBy("r_name")
        .agg(F.count("*").alias("n_other"))
    )


@register(
    "join_range_events",
    """SELECT e1.user_id, count(*)::BIGINT AS n_pairs
       FROM events e1 JOIN events e2
         ON e2.user_id = e1.user_id
        AND e2.ts > e1.ts
        AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
       GROUP BY e1.user_id""",
)
def join_range_events(spark, sf_dir):
    # range join bucketized to an equi-prejoin (SURVEY.md §2.C: at scale the
    # theta join degenerates to BNLJ; bucketing on floor(epoch/300) makes it
    # an equi-join on (user, bucket) with the exact window re-checked after)
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    bsec = 300
    e1 = e.withColumn("b0", F.floor(F.unix_timestamp("ts") / bsec))
    # left side probes its own bucket and the next (window spans ≤ 2 buckets)
    e1x = e1.withColumn(
        "b", F.explode(F.array(F.col("b0"), F.col("b0") + 1))
    ).select(
        F.col("user_id").alias("u1"), F.col("ts").alias("ts1"), "b"
    )
    e2 = e1.select(
        F.col("user_id").alias("u2"), F.col("ts").alias("ts2"), F.col("b0").alias("b")
    )
    pairs = e1x.join(e2, ["b"]).filter(
        (F.col("u1") == F.col("u2"))
        & (F.col("ts2") > F.col("ts1"))
        & (F.col("ts2") <= F.col("ts1") + F.expr("INTERVAL 5 MINUTES"))
    )
    return pairs.groupBy(F.col("u1").alias("user_id")).agg(
        F.count("*").alias("n_pairs")
    )


@register(
    "join_asof_events",
    """SELECT p.event_id, p.user_id,
              CAST(floor(epoch(max(v.ts))) AS BIGINT) AS asof_view_epoch
       FROM events p
       LEFT JOIN events v
         ON v.user_id = p.user_id AND v.event_type = 'view' AND v.ts <= p.ts
       WHERE p.event_type = 'purchase'
       GROUP BY p.event_id, p.user_id""",
)
def join_asof_events(spark, sf_dir):
    # as-of join (A9 generalized [R]): latest 'view' at-or-before each
    # purchase, via the union+window trick — no theta join, scales as a
    # single partitioned sort (SURVEY.md §2.C joins).
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts"),
        F.lit(None).cast("long").alias("event_id"), F.lit(0).alias("is_p"),
    )
    purch = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("view_ts"),
        F.col("event_id"), F.lit(1).alias("is_p"),
    )
    # views sort before purchases at equal ts ⇒ "at or before" semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purch).withColumn(
        "asof_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("is_p") == 1).select(
        "event_id",
        "user_id",
        F.unix_timestamp("asof_view_ts").alias("asof_view_epoch"),
    )


@register(
    "join_skew_salted",
    """SELECT o.o_orderstatus,
              round(sum(l.l_extendedprice), 2) AS sum_price,
              count(*)::BIGINT AS n
       FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       GROUP BY o.o_orderstatus""",
)
def join_skew_salted(spark, sf_dir):
    # explicit two-phase salted join (B7 analog; BASELINE.json:14 skew rule):
    # probe side gets salt = l_linenumber % S, build side replicates ×S.
    S = 8
    li = t(spark, sf_dir, "lineitem").withColumn(
        "_salt", (F.col("l_linenumber") % S).cast("int")
    )
    o = t(spark, sf_dir, "orders").withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(S)]))
    )
    return (
        li.join(o, (li.l_orderkey == o.o_orderkey) & (li._salt == o._salt))
        .groupBy("o_orderstatus")
        .agg(r2(F.sum("l_extendedprice")).alias("sum_price"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# Aggregations (A10/A11/A16 [R] generalized)
# ---------------------------------------------------------------------------


@register(
    "agg_tpch_q1",
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_quantity), 2) AS sum_qty,
              round(sum(l_extendedprice), 2) AS sum_base_price,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                  AS sum_charge,
              round(avg(l_quantity), 4) AS avg_qty,
              round(avg(l_extendedprice), 4) AS avg_price,
              round(avg(l_discount), 4) AS avg_disc,
              count(*)::BIGINT AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def agg_tpch_q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"),
        r2(F.sum("l_extendedprice")).alias("sum_base_price"),
        r2(F.sum(disc)).alias("sum_disc_price"),
        r2(F.sum(disc * (1 + F.col("l_tax")))).alias("sum_charge"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.avg("l_extendedprice")).alias("avg_price"),
        r4(F.avg("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "agg_flags_conditional",
    """SELECT n.n_name,
              (max(CASE WHEN c.c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END) = 1)
                  AS has_automobile,
              (max(CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END) = 1)
                  AS has_building,
              count(DISTINCT c.c_mktsegment)::BIGINT AS n_present,
              (5 - count(DISTINCT c.c_mktsegment))::BIGINT AS n_missing
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       GROUP BY n.n_name""",
)
def agg_flags_conditional(spark, sf_dir):
    # the reference's per-donor completeness flags + missing_items (A10/A11
    # [R]: max(when(...)) conditional agg + expected-minus-present count)
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return j.groupBy("n_name").agg(
        (F.max(F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0)) == 1)
        .alias("has_automobile"),
        (F.max(F.when(F.col("c_mktsegment") == "BUILDING", 1).otherwise(0)) == 1)
        .alias("has_building"),
        F.countDistinct("c_mktsegment").alias("n_present"),
        (5 - F.countDistinct("c_mktsegment")).alias("n_missing"),
    )


@register(
    "agg_count_distinct",
    """SELECT o_orderstatus, count(DISTINCT o_custkey)::BIGINT AS n_cust,
              count(*)::BIGINT AS n_orders
       FROM orders GROUP BY o_orderstatus""",
)
def agg_count_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_cust"),
        F.count("*").alias("n_orders"),
    )


@register("agg_approx_distinct")  # HLL++ — no exact oracle, rows-only check
def agg_approx_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.approx_count_distinct("o_custkey").alias("approx_cust")
    )


@register(
    "agg_rollup",
    """SELECT o_orderpriority, o_orderstatus, count(*)::BIGINT AS n,
              round(sum(o_totalprice), 2) AS sum_price
       FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)""",
)
def agg_rollup(spark, sf_dir):
    # A16 generalized [R]: per-program/project counts with margins
    o = t(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n"), r2(F.sum("o_totalprice")).alias("sum_price")
    )


@register(
    "agg_cube",
    """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
              count(*)::BIGINT AS n
       FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
)
def agg_cube(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        r2(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n")
    )


@register(
    "agg_nested_collect",
    """SELECT n.n_name,
              string_agg(c.c_name, '|' ORDER BY c.c_name) AS cust_names,
              count(*)::BIGINT AS n_cust
       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE c.c_acctbal > 9000
       GROUP BY n.n_name""",
)
def agg_nested_collect(spark, sf_dir):
    # A8 [R]: nested doc build via collect_list — flattened to a sorted
    # joined string so the value hash is order-stable
    c = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    n = t(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), "|").alias(
                "cust_names"
            ),
            F.count("*").alias("n_cust"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (A9 [R] generalized)
# ---------------------------------------------------------------------------


@register(
    "win_topk_per_group",
    """SELECT o_custkey, o_orderkey, rn FROM (
         SELECT o_custkey, o_orderkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) WHERE rn <= 3""",
)
def win_topk_per_group(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn")
    )


@register(
    "win_ranks",
    """SELECT c_custkey,
              rank() OVER w AS rnk,
              dense_rank() OVER w AS drnk,
              ntile(4) OVER w AS quartile,
              round(percent_rank() OVER w, 6) AS prank
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey
                    ORDER BY c_acctbal DESC, c_custkey)""",
)
def win_ranks(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return c.select(
        "c_custkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    )


@register(
    "win_lag_sessions",
    """SELECT user_id, count(*)::BIGINT AS n_events,
              (1 + sum(CASE WHEN gap IS NOT NULL AND gap >= 600 THEN 1 ELSE 0 END))::BIGINT
                  AS n_sessions
       FROM (SELECT user_id,
                    floor(epoch(ts)) - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                                    ORDER BY ts, event_id))) AS gap
             FROM events)
       GROUP BY user_id""",
)
def win_lag_sessions(spark, sf_dir):
    # sessionization via lag + gap threshold (pyspark guide OLAP pattern)
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.withColumn("gap", gap)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (
                1
                + F.sum(
                    F.when(F.col("gap").isNotNull() & (F.col("gap") >= 600), 1)
                    .otherwise(0)
                )
            ).alias("n_sessions"),
        )
    )


@register(
    "win_running_frame",
    """SELECT o_orderkey, o_custkey,
              round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
                  AS running_total
       FROM orders""",
)
def win_running_frame(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "win_lead_delta",
    """SELECT event_id, user_id,
              CAST(floor(epoch(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)))
                   - floor(epoch(ts)) AS BIGINT) AS secs_to_next
       FROM events""",
)
def win_lead_delta(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        (F.unix_timestamp(F.lead("ts").over(w)) - F.unix_timestamp("ts")).alias(
            "secs_to_next"
        ),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / set ops
# ---------------------------------------------------------------------------


@register(
    "sort_topk_global",
    """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
       ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 20""",
)
def sort_topk_global(spark, sf_dir):
    # orderBy().limit() → TakeOrderedAndProject (no full global sort)
    return (
        t(spark, sf_dir, "lineitem")
        .orderBy(F.desc("l_extendedprice"), "l_orderkey", "l_linenumber")
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


@register(
    "set_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus='F'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus='O'""",
)
def set_intersect(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.intersect(b)


@register(
    "set_except_all",
    """SELECT o_custkey FROM orders WHERE o_orderstatus='F'
       EXCEPT ALL
       SELECT o_custkey FROM orders WHERE o_orderstatus='O'""",
)
def set_except_all(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return a.exceptAll(b)


@register(
    "set_union_distinct",
    """SELECT o_custkey FROM orders WHERE o_orderstatus='F'
       UNION
       SELECT o_custkey FROM orders WHERE o_orderstatus='P'""",
)
def set_union_distinct(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    b = o.filter(F.col("o_orderstatus") == "P").select("o_custkey")
    return a.union(b).distinct()


# ---------------------------------------------------------------------------
# Scalar function families (SURVEY.md §2.C scalar table)
# ---------------------------------------------------------------------------


@register(
    "fn_string",
    """SELECT c_custkey,
              lower(c_name) AS lname, upper(c_mktsegment) AS useg,
              length(c_name)::INT AS name_len,
              substring(c_name, 1, 8) AS name_prefix,
              concat_ws('-', c_mktsegment, c_name) AS tagged,
              trim(c_name) AS trimmed,
              regexp_extract(c_name, '(\\d+)$', 1) AS trailing_digits,
              regexp_replace(c_name, '\\d', '#', 'g') AS masked
       FROM customer""",
)
def fn_string(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("lname"),
        F.upper("c_mktsegment").alias("useg"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("tagged"),
        F.trim(F.col("c_name")).alias("trimmed"),
        F.regexp_extract("c_name", r"(\d+)$", 1).alias("trailing_digits"),
        F.regexp_replace("c_name", r"\d", "#").alias("masked"),
    )


@register(
    "fn_datetime",
    """SELECT o_orderkey,
              year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
              day(o_orderdate)::INT AS dom, quarter(o_orderdate)::INT AS qtr,
              CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)
                  AS month_start_epoch,
              CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
              datediff('day', TIMESTAMP '1995-01-01', o_orderdate)::INT
                  AS days_since_95
       FROM orders""",
)
def fn_datetime(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.unix_timestamp(F.date_trunc("month", "o_orderdate")).alias(
            "month_start_epoch"
        ),
        F.unix_timestamp("o_orderdate").alias("order_epoch"),
        F.datediff(
            F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
        ).alias("days_since_95"),
    )


@register(
    "fn_math",
    """SELECT l_orderkey, l_linenumber,
              CAST(round(l_extendedprice * 100) AS BIGINT)
                  * CAST(round(l_discount * 100) AS BIGINT) AS disc_e4,
              CAST(round(abs(l_extendedprice - 30000) * 100) AS BIGINT)
                  AS dist_cents,
              round(ln(l_quantity + 1), 6) AS log_qty,
              round(pow(l_discount, 2), 6) AS disc_sq,
              round(sqrt(l_extendedprice), 6) AS sqrt_price,
              floor(l_quantity)::BIGINT AS qty_floor,
              ceil(l_tax * 100)::BIGINT AS tax_pct_ceil
       FROM lineitem""",
)
def fn_math(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.round(F.col("l_extendedprice") * 100).cast("long")
            * F.round(F.col("l_discount") * 100).cast("long")
        ).alias("disc_e4"),
        F.round(F.abs(F.col("l_extendedprice") - 30000) * 100)
        .cast("long")
        .alias("dist_cents"),
        F.round(F.log(F.col("l_quantity") + 1), 6).alias("log_qty"),
        F.round(F.pow("l_discount", 2), 6).alias("disc_sq"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_tax") * 100).alias("tax_pct_ceil"),
    )


@register(
    "fn_array",
    """SELECT vec_id,
              len(embedding)::INT AS dim,
              round(list_sum(list_transform(embedding[1:8],
                    x -> CAST(x AS DOUBLE))), 4) AS first8_sum,
              round(sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
              round(CAST(list_max(embedding) AS DOUBLE), 4) AS max_el
       FROM embeddings""",
)
def fn_array(spark, sf_dir):
    # higher-order functions over the embedding column (SURVEY.md §2.C array)
    e = t(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(
            F.aggregate(
                F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x
            ),
            4,
        ).alias("first8_sum"),
        F.round(
            F.sqrt(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x)), 4
        ).alias("l2_norm"),
        F.round(F.array_max(dbl), 4).alias("max_el"),
    )


@register(
    "fn_map",
    """SELECT CASE lang WHEN 'en' THEN 'english' WHEN 'de' THEN 'german'
                        WHEN 'fr' THEN 'french' WHEN 'es' THEN 'spanish'
                        ELSE 'other' END AS lang_name,
              count(*)::BIGINT AS n
       FROM documents GROUP BY 1""",
)
def fn_map(spark, sf_dir):
    # map literal + element_at (flags-as-map idiom, SURVEY.md §2.C map)
    d = t(spark, sf_dir, "documents")
    m = F.create_map(
        F.lit("en"), F.lit("english"), F.lit("de"), F.lit("german"),
        F.lit("fr"), F.lit("french"), F.lit("es"), F.lit("spanish"),
    )
    return (
        d.withColumn(
            "lang_name", F.coalesce(F.element_at(m, F.col("lang")), F.lit("other"))
        )
        .groupBy("lang_name")
        .agg(F.count("*").alias("n"))
    )


@register(
    "fn_json",
    """SELECT event_type,
              round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
              max(CAST(json_extract_string(props, '$.k') AS INT))::INT AS max_k
       FROM events GROUP BY event_type""",
)
def fn_json(spark, sf_dir):
    # A4/A13 [R]: JSON in/out; events.props is a JSON string fixture
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.groupBy("event_type").agg(
        r4(F.avg(k)).alias("avg_k"), F.max(k).alias("max_k")
    )


@register(
    "explode_flatten",
    """SELECT vec_id, pos::INT AS pos, round(CAST(val AS DOUBLE), 4) AS val
       FROM (SELECT vec_id,
                    generate_subscripts(embedding, 1) - 1 AS pos,
                    unnest(embedding) AS val
             FROM embeddings)
       WHERE vec_id < 10""",
)
def explode_flatten(spark, sf_dir):
    # A14 [R]: the file-browser flatten — nested arrays → one row per element
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 10)
    return e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "v")
    ).select("vec_id", "pos", F.round(F.col("v").cast("double"), 4).alias("val"))


# ---------------------------------------------------------------------------
# remaining §2.C surface: right join, JSON-with-schema, UDF/UDAF/UDTF,
# grouping sets, exact percentile, pivot/unpivot
# ---------------------------------------------------------------------------


@register(
    "join_right_outer",
    """SELECT c.c_custkey, count(o.o_orderkey)::BIGINT AS n_orders
       FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
       GROUP BY c.c_custkey""",
)
def join_right_outer(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "fn_from_json",
    """SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
       FROM events""",
)
def fn_from_json(spark, sf_dir):
    # A4 [R]: JSON parse with a *declared* schema (from_json), not schema-less
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )


@register(
    "udf_pandas_scalar",
    """SELECT doc_id, round(ln(1 + length(text)) * 0.5, 6) AS quality
       FROM documents""",
)
def udf_pandas_scalar(spark, sf_dir):
    # scalar vectorized UDF (Arrow Series→Series) — §2.C UDF surface
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def quality(text: pd.Series) -> pd.Series:
        return pd.Series(
            np.round(np.log1p(text.str.len().to_numpy(np.float64)) * 0.5, 6)
        )

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", quality("text").alias("quality"))


@register(
    "udaf_grouped_agg",
    """SELECT o_orderstatus, round(exp(avg(ln(o_totalprice))), 4) AS geo_mean
       FROM orders GROUP BY o_orderstatus""",
)
def udaf_grouped_agg(spark, sf_dir):
    # GROUPED_AGG pandas UDF (vectorized UDAF) — geometric mean
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geo_mean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(np.float64)).mean()))

    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(geo_mean("o_totalprice"), 4).alias("geo_mean")
    )


@register(
    "agg_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, count(*)::BIGINT AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""",
)
def agg_grouping_sets(spark, sf_dir):
    t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS n
           FROM _orders_gs
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())"""
    )


@register(
    "fn_percentile",
    """SELECT l_returnflag,
              round(quantile_cont(l_quantity, 0.5), 4) AS med_qty,
              round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price
       FROM lineitem GROUP BY l_returnflag""",
)
def fn_percentile(spark, sf_dir):
    # exact percentile with linear interpolation (matches quantile_cont)
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("med_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
    )


@register(
    "pivot_status",
    """SELECT o_orderpriority,
              sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)::BIGINT AS n_f,
              sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)::BIGINT AS n_o,
              sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END)::BIGINT AS n_p
       FROM orders GROUP BY o_orderpriority""",
)
def pivot_status(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return p.select(
        "o_orderpriority",
        F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
        F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
    )


@register(
    "unpivot_stack",
    """SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
              round(l_quantity, 4) AS val FROM lineitem WHERE l_orderkey < 100
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'discount', round(l_discount, 4)
       FROM lineitem WHERE l_orderkey < 100
       UNION ALL
       SELECT l_orderkey, l_linenumber, 'tax', round(l_tax, 4)
       FROM lineitem WHERE l_orderkey < 100""",
)
def unpivot_stack(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    return li.selectExpr(
        "l_orderkey",
        "l_linenumber",
        "stack(3, 'quantity', round(l_quantity, 4), "
        "'discount', round(l_discount, 4), 'tax', round(l_tax, 4)) "
        "AS (metric, val)",
    )


@register(
    "udtf_token_expand",
    """SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) - 1 AS pos,
              unnest(string_split(text, ' ')) AS token
       FROM documents WHERE doc_id < 5""",
)
def udtf_token_expand(spark, sf_dir):
    # Python UDTF surface (§2.C): lateral table function expanding a row
    # into (pos, token) rows. Not a hot-path operator — demo of the API.
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos int, token string")
    class TokenExpand:
        def eval(self, text: str):
            for i, tok in enumerate(text.split(" ")):
                yield i, tok

    spark.udtf.register("token_expand", TokenExpand)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 5).createOrReplaceTempView(
        "_docs_udtf"
    )
    return spark.sql(
        """SELECT d.doc_id, t.pos, t.token
           FROM _docs_udtf d, LATERAL token_expand(d.text) t"""
    )


@register(
    "fn_array_distinct",
    """SELECT doc_id,
              len(list_distinct(string_split(text, ' ')))::INT AS n_distinct,
              len(string_split(text, ' '))::INT AS n_tokens,
              list_sort(list_distinct(string_split(text, ' ')))[1] AS first_tok
       FROM documents""",
)
def fn_array_distinct(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(toks).alias("n_tokens"),
        F.element_at(F.sort_array(F.array_distinct(toks)), 1).alias("first_tok"),
    )


@register("fn_percentile_approx")  # sketch-based — rows-only check
def fn_percentile_approx(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median")
    )
