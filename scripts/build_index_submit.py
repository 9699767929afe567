"""spark-submit entry point for the index build (north rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage:
  spark-submit --py-files engine.zip scripts/build_index_submit.py \
      --input /path/to/webpages_parquet --index-dir /path/to/index \
      [--checkpoint-dir /path/ckpt] [--partitions 4096] [--doc-ranges 4096] \
      [--term-buckets 256] [--no-dedup] [--no-html-fallback]

On a real cluster the SparkSession comes from spark-submit's conf (master,
executors); locally it falls back to local[*]. Package engine/ with
`cd /repo && zip -r engine.zip engine` for --py-files.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="webpages table path (parquet)")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--partitions", type=int, default=None,
                    help="n_build_partitions (set ~2-4x total cores)")
    ap.add_argument("--doc-ranges", type=int, default=None)
    ap.add_argument("--term-buckets", type=int, default=None)
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--no-html-fallback", action="store_true")
    ap.add_argument("--query", default=None, help="optional smoke query after build")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from engine.config import IndexConfig
    from engine.build import build_index

    spark = SparkSession.builder.appName("inverted-index-build").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    kw = {}
    if args.partitions:
        kw["n_build_partitions"] = args.partitions
    if args.doc_ranges:
        kw["n_doc_ranges"] = args.doc_ranges
    if args.term_buckets:
        kw["n_term_buckets"] = args.term_buckets
    cfg = IndexConfig(**kw)

    wp = spark.read.parquet(args.input)
    if "url" not in wp.columns and {"doc_id", "source", "text"} <= set(wp.columns):
        # fixture `documents` shape → derive the canonical webpages table
        from engine.webpages import to_webpages

        wp = to_webpages(wp)
    handle = build_index(
        spark, wp, args.index_dir, cfg,
        checkpoint_dir=args.checkpoint_dir,
        dedup_latest=not args.no_dedup,
        use_html_fallback=not args.no_html_fallback,
    )
    print(json.dumps(handle.stats))

    if args.query:
        from engine.query import query_topk

        query_topk(spark, handle, args.query, k=10, mode="auto").show(
            10, truncate=False
        )


if __name__ == "__main__":
    main()
