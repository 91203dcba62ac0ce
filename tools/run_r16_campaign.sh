#!/bin/bash
# The r16 measurement campaign, end to end — reproduces every log
# parse_r16_logs.py consumes. Run on an otherwise-idle machine; the
# interleaved harnesses are noise-immune in their RATIOS but not in
# absolute seconds (see SCALING_r16 notes.protocol).
#
# Prereqs (ScaleUp, ~10 min total, ~2.7 GB under /tmp):
#   runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf1   10
#   runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf10  100
#   runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf30  300  embeddings
#   runMain graft.ScaleUp /root/testdata/sf0.1 /tmp/graft_sf100 1000 documents
#
# RUN is how to launch a main with the Test classpath and a 64g heap —
# a plain word-split command prefix, so use the direct-java form:
#   RUN='java <the jdk17 --add-opens flags from build.sbt> -Xmx64g
#        -cp <sbt "export Test/fullClasspath" output>'
# (an sbt -batch "Test/runMain ..." wrapper does NOT word-split into
# this shape — and pays ~20 s of sbt startup per harness anyway).
# Total wall ~2.5 h, dominated by DecadeAB's sf100 side.
set -u
RUN=${RUN:?set RUN to a command that executes 'RUN <mainClass> [args]'}
L=${LOGDIR:-/tmp/r16logs}
mkdir -p "$L"
run() { local log=$1; shift
  echo "=== $(date +%T) START $log: $*"
  $RUN "$@" > "$L/$log" 2>&1 || echo "!!! $log FAILED (exit $?)"
  echo "=== $(date +%T) DONE  $log"
}
run r16_ccshape_sf01.log        graft.CcShapeAB /root/testdata/sf0.1 4
run r16_ckptrace.log            graft.CkptRaceAB /tmp/graft_sf10 3 8
run r16_ccshape_sf10.log        graft.CcShapeAB /tmp/graft_sf10 3
run r16_decont.log              graft.DecontScaleAB /tmp/graft_sf10 /tmp/graft_sf100 3
# LSH-vs-IVF, uniform thr-0.4 regime (pre-kernel grids kept for the
# before/after keys; reruns at HEAD measure the shipped kernel)
run r16_ivf_sf10.log            graft.IvfDedupProfile /tmp/graft_sf10 4,8,16,32,64 1.0 0.4 1 0.3
run r16_ivf_sf30.log            graft.IvfDedupProfile /tmp/graft_sf30 8,32,64 1.0 0.4 1 0.3
run r16_ivf3_sf10.log           graft.IvfDedupProfile /tmp/graft_sf10 16,32,64 1.0 0.4 1 0.3 0
run r16_ivf3_sf30.log           graft.IvfDedupProfile /tmp/graft_sf30 32,64 1.0 0.4 1 0.3 0
# clustered >=0.9 regime (4 planted copies/vector, eps 0.3)
run r16_ivf_clustered_sf1.log   graft.IvfDedupProfile /tmp/graft_sf1 1,2,4 1.0 0.9 4 0.3
run r16_ivf_clustered_sf10.log  graft.IvfDedupProfile /tmp/graft_sf10 1,2,4 1.0,2.0,4.0,8.0 0.9 4 0.3
run r16_ivf2_clustered_sf10.log graft.IvfDedupProfile /tmp/graft_sf10 1,2,4 1.0 0.9 4 0.3 4
run r16_ivf3_clustered_sf10.log graft.IvfDedupProfile /tmp/graft_sf10 1,2,4 1.0 0.9 4 0.3 0,8,16
run r16_ivf2_sf10.log           graft.IvfDedupProfile /tmp/graft_sf10 16,32,64 1.0 0.4 1 0.3 4
# sf10 heavy-set bench: per-query spread map lands on stderr
echo "=== $(date +%T) START r16_bench_sf10.log"
SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 SPARK_GRAFT_BENCH_RUNS=5 \
SPARK_GRAFT_BENCH_ONLY="q_corpus_clean,q_corpus_clean_full,q_corpus_stage_report,q_decontaminate,q_dedup_embedding_ivf,q_dedup_embedding_lsh,q_dedup_exact,q_dedup_groups,q_dedup_groups_star,q_dedup_minhash_lsh,q_dedup_ngram_jaccard,q_dedup_simhash,q_dedup_spans,q_tfidf_top_terms" \
  $RUN graft.Bench > "$L/r16_bench_sf10.log" 2>&1 || echo "!!! bench FAILED"
echo "=== $(date +%T) DONE  r16_bench_sf10.log"
run r16_decade4.log graft.DecadeAB /tmp/graft_sf10 /tmp/graft_sf100 3 q_corpus_clean,q_corpus_clean_full,q_corpus_stage_report,q_decontaminate,q_dedup_exact,q_dedup_groups,q_dedup_groups_star,q_dedup_minhash_lsh,q_dedup_ngram_jaccard,q_dedup_simhash,q_dedup_spans,q_tfidf_top_terms
echo "ALL DONE $(date +%T)"
echo "next: python3 tools/parse_r16_logs.py $L > /tmp/r16_extra.json"
echo "      python3 tools/make_scaling_r16.py --merge /tmp/r16_extra.json"
