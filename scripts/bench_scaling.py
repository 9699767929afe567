"""Two-cluster-size scaling protocol (north rule / BASELINE.md): run
bench.py at local[8] (N) and local[32] (4N) on the same input, report
throughput at both, scaling efficiency = (docs/sec@32) / (4 × docs/sec@8),
and verify the index content hash is identical across parallelism levels.

Writes BENCH/BASELINE.md. Run: python scripts/bench_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    env.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # replicate the corpus so compute dominates fixed job overhead — the
    # scaling comparison is meaningless when a 5k-doc build is ~50% Spark
    # scheduling constant (driver note allows deterministic small-scale
    # synthesis of the input shape)
    env.setdefault("BENCH_SCALE_FACTOR", "2000")
    env.setdefault("BENCH_QUERY_REPS", "1")
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    tp8, tp32 = r8["build_docs_per_sec"], r32["build_docs_per_sec"]
    eff = tp32 / (4 * tp8)
    hash_ok = r8["index_content_hash"] == r32["index_content_hash"]
    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — measured numbers ({time.strftime('%Y-%m-%d %H:%M:%S')})

Protocol: same job, same input ({r8['sf']}), identical configs except
master=local[8] vs local[32] (N vs 4N cores stand in for N vs 4N executors —
no real cluster in this sandbox, per driver note).

| metric | local[8] (N) | local[32] (4N) |
|---|---|---|
| index build (s) | {r8['build_sec']} | {r32['build_sec']} |
| build throughput (docs/sec) | {tp8} | {tp32} |
| BM25 top-10 p50, WAND path (ms) | {r8['query_p50_ms_wand']} | {r32['query_p50_ms_wand']} |
| BM25 top-10 p50, brute path (ms) | {r8['query_p50_ms_brute']} | {r32['query_p50_ms_brute']} |
| postings bytes | {r8['postings_bytes']} | {r32['postings_bytes']} |
| index content hash | {r8['index_content_hash']} | {r32['index_content_hash']} |

**Scaling efficiency (docs/sec@4N) / (4 × docs/sec@N) = {eff:.3f}**
(target ≥ 0.8 — note: at sandbox corpus sizes, fixed Spark job-scheduling
overhead dominates the build; see analysis in BENCH notes)

Index determinism across parallelism: content hash equal = **{hash_ok}**
(precondition for the scaling comparison; also a correctness invariant,
SURVEY.md §5.2).
"""
    with open(os.path.join(ROOT, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"eff": eff, "hash_ok": hash_ok, "tp8": tp8, "tp32": tp32}))


if __name__ == "__main__":
    main()
