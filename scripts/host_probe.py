"""Spark-free host-contention probe for the scaling campaign.

The campaign's pair estimator (BENCH/BASELINE.md) cancels host noise only
when contention hits both levels of a pair symmetrically. The failure mode
observed in rounds 3-5 is ASYMMETRIC: external (hypervisor-side, invisible
in loadavg) load lets a 1-core rep run at ~60% of quiet speed while a
4-core rep gets ~30% — depressing every pair ratio. This probe detects
that regime in ~30 seconds without Spark, so the campaign only burns a
~30-minute pair when a pair is actually measurable:

  - kernel: stream over a 256 MB float64 array (out-of-cache add+copy),
    the same resource mix (memory bandwidth + CPU timeshare) the SPIMI
    build saturates (SURVEY.md §4.2 memory-bandwidth note);
  - solo: one process runs the kernel; 4-way: four concurrent processes;
  - probe_eff = (4-way per-process mean) / solo. On a quiet 32-core box
    4 workers sit far below the ~8-worker bandwidth ceiling, so
    probe_eff ~= 1. Under the asymmetric-contention regime it collapses
    toward n_free_cores/4.

Gate used by the round-5 campaign: resume pairs iff probe_eff >= 0.85.
Prints one JSON line. The probe is a measurement-scheduling tool only —
probe results never enter the scaling artifact; every pair that runs is
reported unconditionally.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

ARR_MB = 256
SECONDS = 8.0


def _stream(arr_mb: float, seconds: float) -> float:
    """Return streamed GB/s for `seconds` of add+copy over an
    out-of-cache array."""
    n = int(arr_mb * (1 << 20) // 8)
    a = np.ones(n, dtype=np.float64)
    b = np.ones(n, dtype=np.float64)
    # warm the pages
    a += b
    t0 = time.perf_counter()
    passes = 0
    while True:
        a += b  # 3 × n × 8 bytes of traffic (read a, read b, write a)
        passes += 1
        dt = time.perf_counter() - t0
        if dt >= seconds:
            break
    return passes * 3 * n * 8 / dt / 1e9


def _worker(q: "mp.Queue", arr_mb: float, seconds: float) -> None:
    q.put(_stream(arr_mb, seconds))


def measure(n_procs: int, arr_mb: float = ARR_MB,
            seconds: float = SECONDS) -> list[float]:
    if n_procs == 1:
        return [_stream(arr_mb, seconds)]
    ctx = mp.get_context("spawn")
    q: "mp.Queue" = ctx.Queue()
    procs = [ctx.Process(target=_worker, args=(q, arr_mb, seconds))
             for _ in range(n_procs)]
    for p in procs:
        p.start()
    vals = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return vals


def main() -> None:
    solo = measure(1)[0]
    four = measure(4)
    per_proc = float(np.mean(four))
    out = {
        "utc": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
        "solo_gbps": round(solo, 3),
        "four_way_gbps": [round(v, 3) for v in four],
        "four_way_mean_gbps": round(per_proc, 3),
        "probe_eff": round(per_proc / solo, 4),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
