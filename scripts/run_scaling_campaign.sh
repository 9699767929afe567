#!/bin/bash
# Scaling campaign driver: chunked invocations of bench_scaling.py
# (1 interleaved N/4N pair each, resuming BENCH/scaling_runs.json) so the
# BENCH/BASELINE.md artifact is rewritten after EVERY pair — a mid-campaign
# kill always leaves a complete, current artifact. Detach with setsid so the
# campaign survives the launching shell.
#
#   setsid nohup bash scripts/run_scaling_campaign.sh > BENCH/r4_campaign.log 2>&1 &
#
# Stop cleanly: touch BENCH/STOP_CAMPAIGN (checked between pairs).
# DEADLINE_EPOCH (unix seconds, optional): no new pair starts after this
# instant — a hard stop so a detached campaign can never contend with the
# end-of-round driver bench.
# PROBE_MIN_EFF (optional, e.g. 0.85): before each pair, run the Spark-free
# host probe (scripts/host_probe.py); if probe_eff is below the threshold the
# host is asymmetrically contended (a pair would be depressed, not cancelled),
# so sleep PROBE_RETRY_SEC and re-probe instead of burning a ~30-min pair.
# Probe results gate SCHEDULING only — every pair that runs is reported.
# LOAD_MAX (optional, e.g. 1.5): additionally require the 1-minute load
# average to be at or below this before starting a pair — r5 ADVICE: the
# bandwidth probe does not catch CPU-timeshare contention that loadavg
# reflects (pairs 12-13 of the r5 campaign passed the probe at load 3-4 and
# dragged the medians). Same scheduling-only semantics as the probe gate.
set -u
cd "$(dirname "$0")/.."
MAX_PAIRS=${MAX_PAIRS:-24}
if [ -n "${PROBE_MIN_EFF:-}" ] || [ -n "${LOAD_MAX:-}" ]; then
  export BENCH_SCALING_NOTE="Admission gates for every pair in this campaign: \
host_probe.py probe_eff >= ${PROBE_MIN_EFF:-off} and 1-min loadavg <= ${LOAD_MAX:-off} \
(scheduling-only gates — every pair that ran is reported)."
fi
DEADLINE_EPOCH=${DEADLINE_EPOCH:-0}
PROBE_MIN_EFF=${PROBE_MIN_EFF:-}
PROBE_RETRY_SEC=${PROBE_RETRY_SEC:-300}
LOAD_MAX=${LOAD_MAX:-}
export BENCH_SCALING_REPS=1

for i in $(seq 1 "$MAX_PAIRS"); do
  if [ -f BENCH/STOP_CAMPAIGN ]; then
    echo "STOP_CAMPAIGN present — exiting after $((i-1)) pairs"
    break
  fi
  if [ "$DEADLINE_EPOCH" -gt 0 ] && [ "$(date -u +%s)" -ge "$DEADLINE_EPOCH" ]; then
    echo "DEADLINE_EPOCH reached — exiting after $((i-1)) pairs"
    break
  fi
  if [ -n "$LOAD_MAX" ]; then
    load1=$(cut -d' ' -f1 /proc/loadavg)
    load_ok=$(python -c "import sys; print(1 if float(sys.argv[1]) <= float(sys.argv[2]) else 0)" "$load1" "$LOAD_MAX")
    if [ "$load_ok" != "1" ]; then
      echo "load $load1 > LOAD_MAX=$LOAD_MAX — sleeping ${PROBE_RETRY_SEC}s"
      sleep "$PROBE_RETRY_SEC"
      continue
    fi
  fi
  if [ -n "$PROBE_MIN_EFF" ]; then
    probe_json=$(python scripts/host_probe.py)
    echo "probe $(date -u +%H:%M:%S): $probe_json"
    probe_ok=$(python -c "import json,sys; print(1 if json.loads(sys.argv[1])['probe_eff'] >= float(sys.argv[2]) else 0)" "$probe_json" "$PROBE_MIN_EFF")
    if [ "$probe_ok" != "1" ]; then
      echo "host contended (probe_eff < $PROBE_MIN_EFF) — sleeping ${PROBE_RETRY_SEC}s"
      sleep "$PROBE_RETRY_SEC"
      continue
    fi
  fi
  echo "=== pair $i/$MAX_PAIRS $(date -u +%H:%M:%S) load=$(cut -d' ' -f1 /proc/loadavg) ==="
  # resume iff the accumulated json itself exists (ADVICE r4: keying on a
  # separate marker file crashes every iteration if the json was moved, and
  # deleting the marker silently overwrote the accumulated campaign)
  if [ -f BENCH/scaling_runs.json ]; then
    BENCH_SCALING_RESUME=BENCH/scaling_runs.json BENCH_SCALING_SKIP_REF=1 \
      python scripts/bench_scaling.py
  else
    # fresh start: archive any stray prior artifact, include the one
    # local[32] reference run
    python scripts/bench_scaling.py
  fi
done
echo "campaign done $(date -u +%H:%M:%S)"
