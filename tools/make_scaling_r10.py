#!/usr/bin/env python3
"""Assemble SCALING_r10.json from the round-10 heavy-set bench logs
(sf1 vs sf10, best-of-5 — see `protocol` below for why the run count
went up this round). Usage:
  python3 tools/make_scaling_r10.py <sf1Json> <sf10Json> [extraJson]
extraJson (optional) is merged verbatim under "measurements" — the
round's isolated minhash runs, oracle spot-checks, recall floors.
"""
import sys, json

NOTES = {
    "method": "12-query heavy set (dedup/corpus/groups/decontaminate/"
        "tfidf/spans family + embedding_lsh), sf10 = ScaleUp 100x of "
        "sf0.1 (~10x sf1 rows), local[32], 64g heap, machine otherwise "
        "idle. Queries absent from the set (e.g. q_dedup_embedding) "
        "are the documented O(n^2) oracle twins, out of scope by "
        "design.",
    "protocol": "best-of-FIVE timed runs per query this round (r9 used "
        "best-of-2). The r10 bimodality probes (MinhashProfile, KnobAB) "
        "showed per-query times on this VM converge over many runs — "
        "q_dedup_groups at sf1 measured 47.5/21.7 s on early rounds and "
        "4.8 s converged IN THE SAME JVM, with a fixed single-thread "
        "spin calibration bouncing 0.38..1.6 s across minutes-long host "
        "phases. Best-of-2 numbers therefore carry up-to-10x warm-up/"
        "host-phase inflation; best-of-5 lands much closer to the "
        "converged floor. Cross-round deltas vs SCALING_r9 (best-of-2, "
        "8m maxPartitionBytes) are protocol-confounded — compare "
        "ratios, not absolute seconds.",
    "round_10_fixes_measured_here": [
        "q_dedup_minhash_lsh: (a) the Jaccard verify no longer expands "
        "candidate pairs by shingle rows (11.8 GB of pair-x-shingle "
        "shuffle at sf10 crossing two exchanges + a re-aggregation); "
        "it joins pairs against per-doc ascending sorted hash-set "
        "arrays and counts the intersection in-stage with the compiled "
        "SortedIntersectCount merge walk. (b) the shingle indexes "
        "repartition by doc_id BEFORE the distinct, so the per-doc "
        "signature aggregates (128-long minhash sigs, 65-long simhash "
        "votes) keep ONE local buffer per doc instead of shipping one "
        "wide partial per doc per map task (33x the index bytes at "
        "sf10). (c) SortedLongSetAgg collects the hash sets into raw "
        "long[] (collect_list's boxed buffers were hundreds of "
        "GC-seconds per sf10 run).",
        "The r9 10.48x flag is adjudicated as the sum of (a)+(b) GC "
        "pressure plus host-phase noise: isolated fresh-JVM best now "
        "measures sf1 2.9-3.9 s / sf10 15.5 s (~4-9x).",
    ],
}


def main():
    sf1 = json.load(open(sys.argv[1]))
    sf10 = json.load(open(sys.argv[2]))
    extra = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}
    qs = {}
    flagged = []
    for q, t1 in sorted(sf1["queries"].items()):
        t10 = sf10["queries"].get(q)
        if t10 is None or t1 <= 0 or t10 <= 0:
            continue
        ratio = round(t10 / t1, 2)
        qs[q] = {"sf1_s": t1, "sf10_s": t10, "ratio": ratio}
        if ratio > 10.0:
            flagged.append(q)
    total1 = round(sum(v["sf1_s"] for v in qs.values()), 3)
    total10 = round(sum(v["sf10_s"] for v in qs.values()), 3)
    out = {
        "factor": 10.0,
        "decade": "sf1 -> sf10 (second decade, re-measured post-r10 "
                  "minhash rewrite; r8 covered sf0.1 -> sf1)",
        "queries": qs,
        "total_sf1_s": total1,
        "total_sf10_s": total10,
        "total_ratio": round(total10 / total1, 2),
        "superlinear_flagged": flagged,
        "measurements": extra,
        "notes": NOTES,
    }
    json.dump(out, open("SCALING_r10.json", "w"), indent=2)
    print(json.dumps({"total_ratio": out["total_ratio"],
                      "flagged": flagged}, indent=None))


if __name__ == "__main__":
    main()
