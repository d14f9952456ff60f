#!/bin/bash
# Round-9 state-commit knob sweep (VERDICT r8 task 2): state-partition
# count x trigger size x state-store provider over four representative
# stateful pipelines. One StreamBench JSON line per configuration ->
# STREAMSWEEP_r09.json; the derived knob rule lives in BASELINE.md.
set -u
cd /root/repo
PIPES=wordcount,dedup_ttl,latest_per_key,incremental_topn
OUT=${1:-/root/repo/STREAMSWEEP_r09.json}
: > "$OUT"
run() { # rows rocksdb partitions
  echo "[sweep] rows=$1 rocksdb=$2 partitions=$3" >&2
  SPARK_GRAFT_STREAM_PIPELINES=$PIPES \
  SPARK_GRAFT_STREAM_ROWS=$1 SPARK_GRAFT_STREAM_ROCKSDB=$2 \
  SPARK_GRAFT_STREAM_SHUFFLE=$3 \
  sbt -batch "runMain graft.StreamBench" 2>/dev/null \
    | grep '"metric":"stream_throughput"' >> "$OUT"
}
# partition sweep at the 500k default trigger, in-heap provider
for p in 4 8 16 32 64; do run 500000 false "$p"; done
# provider cross-check at the two partition extremes
for p in 8 32; do run 500000 true "$p"; done
# large-trigger cross-check (RocksDB: the in-heap store OOM-cascades the
# fMGWS pipelines at 2M rows/batch -- measured round 8)
for p in 8 32; do run 2000000 true "$p"; done
