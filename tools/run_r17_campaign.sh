#!/bin/bash
# The r17 measurement campaign — reproduces every log
# parse_r17_logs.py consumes (the sf0.1 re-land runs A/B and the sf10
# heavy-set re-land are produced separately, FIRST, on an otherwise
# idle machine: they are the verdict-item-1 adjudication and must not
# share the host with anything).
#
# Prereqs: the /tmp/graft_sf{1,10,30,100} ScaleUp dirs (see
# run_r16_campaign.sh header) and RUN set to a word-split java command
# prefix with the Test classpath (see tools/run_r16_campaign.sh).
set -u
RUN=${RUN:?set RUN to a command that executes 'RUN <mainClass> [args]'}
L=${LOGDIR:-/tmp/r17logs}
mkdir -p "$L"
run() { local log=$1; shift
  echo "=== $(date +%T) START $log: $*"
  $RUN "$@" > "$L/$log" 2>&1 || echo "!!! $log FAILED (exit $?)"
  echo "=== $(date +%T) DONE  $log"
}
# sf1 heavy set (the queries-block denominator; sf10 side ran in the
# re-land script)
echo "=== $(date +%T) START r17_bench_sf1.log"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 SPARK_GRAFT_BENCH_RUNS=5 \
SPARK_GRAFT_BENCH_ONLY="q_corpus_clean,q_corpus_clean_full,q_corpus_stage_report,q_decontaminate,q_dedup_embedding_ivf,q_dedup_embedding_lsh,q_dedup_exact,q_dedup_groups,q_dedup_groups_star,q_dedup_minhash_lsh,q_dedup_ngram_jaccard,q_dedup_simhash,q_dedup_spans,q_tfidf_top_terms" \
  $RUN graft.Bench > "$L/r17_bench_sf1.log" 2> "$L/r17_bench_sf1.err" || echo "!!! sf1 bench FAILED"
echo "=== $(date +%T) DONE  r17_bench_sf1.log"
# CC round attribution (verdict item 5) — sf100 side is the long pole
run r17_ccrounds.log graft.CcRoundsAB /tmp/graft_sf10 /tmp/graft_sf100 2 q_dedup_groups,q_dedup_groups_star
# hierarchical-fit A/B (verdict item 2)
run r17_ivffit.log graft.IvfFitAB /tmp/graft_sf30 8192,16384,32768,131072,262144 32768
# two-level knee at p ~ sqrt(nCells)/2 (verdict item 3 / ADVICE r16):
# probes 25 sizes nCells to 2442 (population rule), sRows 50 — sp=50 is
# probe-all (flat-equivalent), sp=0 the auto rule (=50 here)
run r17_ivf_knee.log graft.IvfDedupProfile /tmp/graft_sf10 25 1.0 0.4 1 0.3 0,4,8,12,25,50
# nCells >= 1e5 done-gate (verdict item 2): clustered regime, cf forces
# ~100k cells over the 800k-vector planted corpus — only completes in
# bounded driver time with the hierarchical fit
run r17_ivf_1e5.log graft.IvfDedupProfile /tmp/graft_sf10 4 112.0 0.9 4 0.3 0
# sf30 uniform re-run at the hier fit (18.7k cells > hier threshold):
# prices the fit change's recall impact against SCALING_r16
# lsh_vs_ivf_sf30_twolevel_auto
run r17_ivf_sf30_auto.log graft.IvfDedupProfile /tmp/graft_sf30 32,64 1.0 0.4 1 0.3 0
echo "ALL DONE $(date +%T)"
echo "next: python3 tools/parse_r17_logs.py $L > /tmp/r17_extra.json"
echo "      python3 tools/make_scaling_r17.py $L/r17_bench_sf1.log $L/r17_bench_sf10.log /tmp/r17_extra.json"

# ---- r17b: the shuffle-partition-posture campaign (second half of the
# round; logs land in $LB and are merged by parse_r17b_logs.py).
# Prereq: /tmp/graft_sf100 with documents (see r16 header).
# NOTE: r17b_partscale_sf01.log in the committed artifact was produced
# at the PRE-sizing build (it is the evidence that motivated
# Dedup.indexShuffleParts / buildEdges sizing); re-running it at HEAD
# reproduces the v2 numbers instead — the tax it prices is gone.
LB=${LOGDIR_B:-/tmp/r17blogs}
mkdir -p "$LB"
runb() { local log=$1; shift
  echo "=== $(date +%T) START $log: $*"
  $RUN "$@" > "$LB/$log" 2>&1 || echo "!!! $log FAILED (exit $?)"
  echo "=== $(date +%T) DONE  $log"
}
# sf0.1 posture pricing: heavy persist-heavy queries + sub-second
# shuffly queries, 32 vs 320 initial partitions, same JVM
runb r17b_partscale_sf01_v2.log graft.PartitionScaleAB \
  "q_dedup_ngram_jaccard,q_dedup_groups,q_corpus_clean_full,q_dedup_minhash_lsh,q_token_count,q_ema,q1_pricing_summary,q_events_tumbling_agg" \
  /root/testdata/sf0.1 3 32 320
# sf100 wired-default spill gate (no conf flips — measures the shipped
# posture; expect disk_spill_mb 0 and ~210-task index stages)
runb r17b_qprof_ngram_sf100.log graft.QueryProfile q_dedup_ngram_jaccard /tmp/graft_sf100 2
runb r17b_qprof_groups_sf100.log graft.QueryProfile q_dedup_groups /tmp/graft_sf100 1
echo "next: python3 tools/parse_r17b_logs.py $LB --merge"
