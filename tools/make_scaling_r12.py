#!/usr/bin/env python3
"""Assemble SCALING_r12.json from the round-12 heavy-set bench logs
(sf1 vs sf10, best-of-5 — the r10 protocol; see SCALING_r10 notes for
the convergence measurements that justify it). Usage:
  python3 tools/make_scaling_r12.py <sf1Json> <sf10Json> [extraJson]
extraJson (optional) is merged verbatim under "measurements" — this
round (the r11 verdict's item 1, the three owed drills plus the r12
changes): the MEASURED sf10 embedding-LSH recall (RecallProfile's
sampled-exact protocol), the q_corpus_clean_full sf10 oracle check,
the simhash chunk-saturation drop counts read from the sf10 bench
stderr, and the post-length-filter ngram-jaccard / groups ratios.

Bench emits per-query times in integer MILLISECONDS since r11
("qunit":"ms" — the artifact-overflow fix); this tool converts back to
seconds so SCALING_r12 stays unit-compatible with r8-r11.
"""
import sys, json

NOTES = {
    "method": "13-query heavy set (dedup/corpus/groups/decontaminate/"
        "tfidf/spans family + embedding_lsh + corpus_clean_full), sf10 "
        "= ScaleUp 10x of /tmp/graft_sf1 (itself 10x of sf0.1), "
        "local[32], 64g heap, machine otherwise idle. Queries absent "
        "from the set (e.g. q_dedup_embedding) are the documented "
        "O(n^2) oracle twins, out of scope by design.",
    "protocol": "best-of-FIVE timed runs per query (r10 protocol; the "
        "r10 bimodality probes showed best-of-2 carries up-to-10x "
        "warm-up/host-phase inflation on this VM). Compare sf1:sf10 "
        "RATIOS, never absolute seconds across rounds.",
    "round_12_changes_measured_here": [
        "q_decontaminate: the corpus side now emits per-document "
        "DISTINCT shingles from the generator (shingles_distinct, "
        "deduped while streaming in the scan stage), so the overlap "
        "aggregate is a plain partial-combined count(1) instead of the "
        "countDistinct rewrite that shuffled every distinct "
        "(train, eval, shingle-string) triple - flagged set "
        "bit-identical (same distinct-intersection integer, identical "
        "division), only the exchange shrinks.",
        "q_dedup_groups / q_dedup_groups_star: the symmetric edge set "
        "is stored via persist() instead of localCheckpoint - Spark "
        "preserves a cached plan's output partitioning/ordering by "
        "default (canChangeCachedPlanOutputPartitioning=false), so the "
        "per-round join still reads edges with no exchange and no "
        "sort, WITHOUT the session-global AQE toggle the checkpoint "
        "capture needed (r11 advice: concurrent-planning hazard). "
        "PlanAuditSpec pins the no-exchange/no-sort property.",
    ],
}


def qsecs(bench):
    """Per-query seconds from a bench JSON of either unit generation."""
    ms = bench.get("qunit") == "ms"
    return {q: (v / 1000.0 if ms else v) for q, v in bench["queries"].items()}


def main():
    sf1 = qsecs(json.load(open(sys.argv[1])))
    sf10 = qsecs(json.load(open(sys.argv[2])))
    extra = json.load(open(sys.argv[3])) if len(sys.argv) > 3 else {}
    qs = {}
    flagged = []
    for q, t1 in sorted(sf1.items()):
        t10 = sf10.get(q)
        if t10 is None or t1 <= 0 or t10 <= 0:
            continue
        ratio = round(t10 / t1, 2)
        qs[q] = {"sf1_s": round(t1, 3), "sf10_s": round(t10, 3), "ratio": ratio}
        if ratio > 10.0:
            flagged.append(q)
    total1 = round(sum(v["sf1_s"] for v in qs.values()), 3)
    total10 = round(sum(v["sf10_s"] for v in qs.values()), 3)
    out = {
        "factor": 10.0,
        "decade": "sf1 -> sf10 (second decade, re-measured post-r12 "
                  "decontaminate/CC-cache changes; r8 covered sf0.1 -> sf1)",
        "queries": qs,
        "total_sf1_s": total1,
        "total_sf10_s": total10,
        "total_ratio": round(total10 / total1, 2),
        "superlinear_flagged": flagged,
        "measurements": extra,
        "notes": NOTES,
    }
    json.dump(out, open("SCALING_r12.json", "w"), indent=2)
    print(json.dumps({"total_ratio": out["total_ratio"],
                      "flagged": flagged}, indent=None))


if __name__ == "__main__":
    main()
