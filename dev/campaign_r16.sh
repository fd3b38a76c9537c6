#!/bin/bash
# r16 measurement campaign — run SERIALLY so nothing contends with the
# timed regions. Artifacts land in the repo root; raw logs in /tmp.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "[campaign] 1/5 sf0.1 builder bench" >&2
SPARK_DRIVER_MEM=24g SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  dev/run_main.sh graft.Bench > /tmp/bench_r16.out 2>/tmp/bench_r16.err
grep '"metric"' /tmp/bench_r16.out | tail -1 > BENCH_r16_builder.json

echo "[campaign] 2/5 debut scale probes: g_fastrp + t_kn3_logprob (sf1, sf10)" >&2
for q in g_fastrp t_kn3_logprob; do
  for sf in /root/repo/target/sf1 /root/repo/target/sf10; do
    SPARK_DRIVER_MEM=64g dev/run_main.sh graft.BenchOne "$q" "$sf" 2 \
      >> /tmp/benchone_r16.out 2>>/tmp/benchone_r16.err
  done
done
# g_louvain_trace is the monitor twin of g_louvain — one sf1 point
# bounds its overhead vs g_louvain's published 43.9 s
SPARK_DRIVER_MEM=64g dev/run_main.sh graft.BenchOne g_louvain_trace /root/repo/target/sf1 2 \
  >> /tmp/benchone_r16.out 2>>/tmp/benchone_r16.err

echo "[campaign] 3/5 sf10 extended set (fused pair now timed as a unit)" >&2
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
  dev/run_main.sh graft.BenchSf10 > /tmp/benchsf10_r16.out 2>/tmp/benchsf10_r16.err
grep '"metric"' /tmp/benchsf10_r16.out | tail -1 > BENCH_SF10_EXT_r16.json

echo "[campaign] 4/5 louvain cycle-exit probe (sf1 budget 40, then sf10 budget 40)" >&2
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/target/sf1 \
  dev/run_main.sh graft.ProbeLouvainExit 40 \
  > /tmp/probelouvainexit_r16.out 2>/tmp/probelouvainexit_r16.err
SPARK_DRIVER_MEM=64g SPARK_GRAFT_SF_DIR=/root/repo/target/sf10 \
  dev/run_main.sh graft.ProbeLouvainExit 40 \
  >> /tmp/probelouvainexit_r16.out 2>>/tmp/probelouvainexit_r16.err

echo "[campaign] 5/5 done"
echo DONE > /tmp/campaign_r16.done
