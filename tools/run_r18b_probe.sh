#!/bin/bash
# r18 second campaign: localize the ngram-family excursions. The r18
# full-suite re-land measured per-query spreads of 52-140 s on 4-11 s
# bests for q_dedup_groups / q_dedup_groups_star / q_dedup_ngram_jaccard
# — the SAME family as BENCH_r17's adjudicated-contaminated outliers.
# Family selectivity is not what uniform neighbor-CPU noise looks like,
# so this probes whether the excursion (a) reproduces in isolation with
# stage attribution (QueryProfile: in-stage cpu/GC vs between-stage
# scheduling gap), and (b) reproduces under Bench's suite-context heap
# history (filtered Bench, many runs, per-run times on stderr).
set -u
RUN=${RUN:?set RUN to a command that executes 'RUN <mainClass> [args]'}
L=${LOGDIR:-/tmp/r18logs}
mkdir -p "$L"
run() { local log=$1; shift
  echo "=== $(date +%T) START $log: $*"
  $RUN "$@" > "$L/$log" 2>&1 || echo "!!! $log FAILED (exit $?)"
  echo "=== $(date +%T) DONE  $log"
}
run r18b_qprof_star_sf01.log  graft.QueryProfile q_dedup_groups_star /root/testdata/sf0.1 12
run r18b_qprof_groups_sf01.log graft.QueryProfile q_dedup_groups /root/testdata/sf0.1 12
# The family suites parse_r18_logs.py consumes (codegen_cache_excursions
# key): family{2,3} were produced at the PRE-codegen-fix tree (Sessions
# before commit 4fbb883 — the 100-entry cache is a STATIC conf, so the
# before side cannot be reproduced at HEAD without checking out the
# parent commit); family4 = after the cache bump; at final HEAD the same
# invocation reproduces the fixed behavior (family6-equivalent). All
# family runs need STAGEPROF for the excursion dumps the parser scrapes.
echo "=== $(date +%T) START r18b_bench_family4"
SPARK_GRAFT_BENCH_STAGEPROF=1 \
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_BENCH_RUNS=8 \
SPARK_GRAFT_BENCH_ONLY="q_dedup_groups,q_dedup_groups_star,q_dedup_ngram_jaccard,q_dedup_spans,q_corpus_clean" \
  $RUN graft.Bench > "$L/r18b_bench_family4.log" 2> "$L/r18b_bench_family4.err" \
  || echo "!!! family bench FAILED"
echo "=== $(date +%T) DONE  r18b_bench_family4"
# the id-in-class-name half of the fix A/Bs at RUNTIME (dynamic conf):
run r18b_churn_ab.log graft.CodegenChurnAB q_dedup_groups /root/testdata/sf0.1 6
echo "ALL DONE $(date +%T)"
