#!/bin/bash
# Round-exit verification chain — STRICTLY SERIALIZED (run nothing else,
# not even "quick" test re-runs, while this is active: a concurrent
# Spark session both skews step-8 timings and can flip AQE stage-reuse
# decisions, which round 11 proved shows up in plan-fingerprint diffs).
#
# Usage: nohup bash tools/exit_chain.sh > /tmp/exit_chain.log 2>&1 &
# Filters keep FAIL verdict lines visible (round-11 lesson: `tail -6`
# swallowed the only FAIL line and cost a debugging round-trip).
set -o pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD"
log() { echo "=== $(date -u +%H:%M:%S) $1"; }

# Preserve the prior round's committed bench sidecar for the tripwire
# BEFORE bench.py overwrites the tree copy. Guard: a hot-tier record
# must never be the baseline.
# (r11 advisor: the guard must be FATAL — without the || the heredoc's
# nonzero exit was ignored and step 9 silently compared against an
# invalid baseline.)
git show HEAD:BENCH_DETAIL.json > /tmp/bench_detail_prior.json \
  || { echo "FATAL: HEAD has no BENCH_DETAIL.json"; exit 1; }
python - <<'PY' || { echo "FATAL: baseline not a full-tier FIFO record — find one"; exit 1; }
import json
d = json.load(open('/tmp/bench_detail_prior.json'))
assert d.get('tier') == 'full', f"baseline tier={d.get('tier')} — find a full-tier commit"
# conc>0 runs execute even the serialized pass under FAIR (mixed
# protocol); pre-r12 records lack the key and were all FIFO.
assert d.get('scheduler', 'FIFO') == 'FIFO', f"baseline scheduler={d.get('scheduler')}"
PY

log "STEP 1: pytest"
SPARK_GRAFT_CPUS=8 python -m pytest tests/ -q 2>&1 | grep -E "^FAILED|^ERROR|passed|failed" | tail -5

log "STEP 2: full sweep sf0.01 (+manifest check/write)"
SPARK_GRAFT_CPUS=8 python tools/check_correctness.py /root/testdata/sf0.01 \
  --manifest-check MANIFEST.json --manifest-write MANIFEST.json 2>&1 \
  | grep -E "^FAIL|ok, |DRIFT|missing|not in manifest|wrote"

log "STEP 3: full sweep sf0.1 (+manifest check/write)"
SPARK_GRAFT_CPUS=8 python tools/check_correctness.py /root/testdata/sf0.1 \
  --manifest-check MANIFEST.json --manifest-write MANIFEST.json 2>&1 \
  | grep -E "^FAIL|ok, |DRIFT|missing|not in manifest|wrote"

log "STEP 4: plan audit (regenerates PLANS.md)"
SPARK_GRAFT_CPUS=8 python tools/audit_plans.py 2>&1 | tail -2

log "STEP 5: oracle-mirror audit"
SPARK_GRAFT_CPUS=8 python tools/audit_oracles.py 2>&1 | tail -3

log "STEP 6: decimal-cast audit"
python tools/audit_decimal_casts.py 2>&1 | tail -2

log "STEP 7: row-loop audit"
python tools/audit_row_loops.py 2>&1 | tail -2

log "STEP 8: full-tier bench (box must be otherwise idle)"
python bench.py 2>&1 | tail -2

log "STEP 9: tripwire vs prior sidecar"
python tools/bench_compare.py BENCH_DETAIL.json /tmp/bench_detail_prior.json 2>&1 | tail -8

log "STEP 10: vanilla driver-contract smoke"
python - <<'PY'
from pyspark.sql import SparkSession
spark = SparkSession.builder.master('local[8]').config('spark.ui.enabled','false').getOrCreate()
import __spark_entry__ as e
print('entry rows:', e.entry(spark).count(), '| queries:', len(e.queries()), '| oracles:', len(e.oracle_sql()))
spark.stop()
PY

log "CHAIN DONE"
