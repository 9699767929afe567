"""One-off build-only scaling curve: build the replicated corpus at several
parallelism levels in fresh subprocesses and print docs/sec per level.
Diagnostic for picking the official N→4N pair (see bench_scaling.py)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, tempfile, time
sys.path.insert(0, %(root)r)
from engine.session import get_spark
from engine.build import build_index
from engine.config import IndexConfig
from engine.webpages import load_webpages, replicate_webpages

cpus = int(sys.argv[1]); scale = int(sys.argv[2])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(8, cpus))
spark.sparkContext.setLogLevel("ERROR")
cfg = IndexConfig(n_build_partitions=32, n_doc_ranges=32, min_hot_df=256,
                  n_term_buckets=16)
wp = (replicate_webpages(load_webpages(spark, "/root/testdata/sf0.1"), scale)
      .drop("html").repartition(max(64, cpus * 4)).persist())
n = wp.count()
t0 = time.time()
h = build_index(spark, wp, tempfile.mkdtemp(prefix="curve_"), cfg)
dt = time.time() - t0
print(json.dumps({"cpus": cpus, "n": n, "sec": round(dt, 1),
                  "dps": round(n / dt, 1),
                  "phases": h.stats["phase_seconds"],
                  "hash": None}))
"""


def main() -> None:
    scale = int(os.environ.get("CURVE_SCALE", "1000"))
    levels = [
        int(x) for x in os.environ.get("CURVE_CPUS", "1,2,4,8").split(",")
    ]
    for c in levels:
        p = subprocess.run(
            [sys.executable, "-c", CHILD % {"root": ROOT}, str(c), str(scale)],
            capture_output=True, text=True, timeout=5400,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        print(line[-1] if line else json.dumps(
            {"cpus": c, "error": p.stderr[-500:]}), flush=True)


if __name__ == "__main__":
    main()
