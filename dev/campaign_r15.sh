#!/bin/bash
# r15 measurement campaign — run SERIALLY so nothing contends with the
# timed regions. Artifacts land in the repo root; raw logs in /tmp.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[campaign] 1/5 sf0.1 builder bench" >&2
SPARK_DRIVER_MEM=24g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  dev/run_main.sh graft.Bench > /tmp/bench_r15.out 2>/tmp/bench_r15.err
grep '"metric"' /tmp/bench_r15.out | tail -1 > BENCH_r15_builder.json

echo "[campaign] 2/5 sf10 extended set (per-entry sentinels)" >&2
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
  dev/run_main.sh graft.BenchSf10 > /tmp/benchsf10_r15.out 2>/tmp/benchsf10_r15.err
grep '"metric"' /tmp/benchsf10_r15.out | tail -1 > BENCH_SF10_EXT_r15.json

echo "[campaign] 3/5 fused-pair probe at sf10" >&2
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
  dev/run_main.sh graft.ProbeFused > /tmp/probefused_r15.out 2>/tmp/probefused_r15.err

echo "[campaign] 4/5 ANN bucket-pruning probe at sf10, 4096 buckets" >&2
GRAFT_ANN_BUCKETS=4096 SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
  dev/run_main.sh graft.ProbeAnn > /tmp/probeann_r15.out 2>/tmp/probeann_r15.err

echo "[campaign] 5/5 debut scale probes (sf1, sf10)" >&2
for q in p_tokenize_shards; do
  for sf in /root/repo/target/sf1 /root/repo/target/sf10; do
    SPARK_DRIVER_MEM=64g dev/run_main.sh graft.BenchOne "$q" "$sf" 2 \
      >> /tmp/benchone_r15.out 2>>/tmp/benchone_r15.err
  done
done
# g_louvain sf1 (sf10 is covered by the BenchSf10 set above)
SPARK_DRIVER_MEM=64g dev/run_main.sh graft.BenchOne g_louvain /root/repo/target/sf1 2 \
  >> /tmp/benchone_r15.out 2>>/tmp/benchone_r15.err

echo DONE > /tmp/campaign_r15.done
echo "[campaign] done" >&2
