#!/usr/bin/env python3
"""Assemble SCALING_r17.json from the round-17 quiet-host re-land bench
logs (sf1 vs sf10 heavy set, best-of-5 — the r10 protocol) plus the
r17 measurement campaign (parse_r17_logs.py output). Usage:
  python3 tools/make_scaling_r17.py <sf1BenchLog> <sf10BenchLog> [extraJson]
  python3 tools/make_scaling_r17.py --merge <extraJson>
The bench args are LOG FILES (the java runs' stdout), not driver JSON
wrappers — the JSON line is scraped with the same parser the campaign
uses. Merge mode keeps the landed queries block and replaces only
"measurements". Inherits r16's two artifact sanity passes and adds
nothing else: annotate_noise (spread > best wall ⇒ ratio carries a
host-phase term) and annotate_run_monotonicity (wall must not decrease
in probes at fixed cf/sp inside one ivfprof key — r17, verdict r16
item 3, now also applied retroactively to SCALING_r16).
"""
import sys, json, os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_scaling_r16 import annotate_noise, annotate_run_monotonicity  # noqa: E402
from parse_r17_logs import bench_json  # noqa: E402

OUT = "SCALING_r17.json"

NOTES = {
    "method": "14-query heavy set (dedup/corpus/groups/decontaminate/"
        "tfidf/spans family + embedding_lsh + embedding_ivf + "
        "corpus_clean_full), sf10 = ScaleUp 100x of /root/testdata/"
        "sf0.1, local[32], 64g heap, machine otherwise idle — the "
        "QUIET-HOST RE-LAND the r16 verdict asked for (r16's committed "
        "sf10 walls landed in a noisy phase and were self-flagged). "
        "Measured at r17 HEAD: identical wired plans to r16 for every "
        "query in this set (the r17 hierarchical fit only changes "
        "configs requesting >4096 cells; the wired q_dedup_embedding_ivf "
        "sizes to 782 cells at sf10).",
    "protocol": "best-of-FIVE timed runs per query (r10 protocol), "
        "cache-honest since r13. Compare sf1:sf10 RATIOS, never absolute "
        "seconds across rounds. The adjudication measurements "
        "(CcRoundsAB/IvfFitAB) alternate sides inside one JVM so the "
        "documented day-scale host bimodality cancels in their ratios; "
        "fit-wall numbers are driver-local arithmetic on identical "
        "bytes, the one case where absolute seconds ARE comparable "
        "within a log.",
}


def qsecs_from_log(path):
    j = bench_json(open(path, errors="replace").read())
    if j is None:
        raise SystemExit(f"no bench JSON line in {path}")
    ms = j.get("qunit") == "ms"
    return {q: (v / 1000.0 if ms else v) for q, v in j["queries"].items()}


def main():
    if sys.argv[1] == "--merge":
        out = json.load(open(OUT))
        out["measurements"] = json.load(open(sys.argv[2]))
        annotate_noise(out)
        annotate_run_monotonicity(out)
        json.dump(out, open(OUT, "w"), indent=2)
        print(json.dumps({"merged_keys": sorted(out["measurements"].keys()),
                          "noise_flagged": out.get("noise_flagged", [])}))
        return
    sf1 = qsecs_from_log(sys.argv[1])
    sf10 = qsecs_from_log(sys.argv[2])
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
        "decade": "sf1 -> sf10 (second decade, QUIET-HOST re-land of the "
                  "r16 series at r17 HEAD; the measurements block carries "
                  "the r16-regression adjudication, the hierarchical-fit "
                  "A/B, the two-level knee sweep, the nCells>=1e5 "
                  "done-gate run, and the CC round-count attribution)",
        "queries": qs,
        "total_sf1_s": total1,
        "total_sf10_s": total10,
        "total_ratio": round(total10 / total1, 2),
        "superlinear_flagged": flagged,
        "measurements": extra,
        "notes": NOTES,
    }
    annotate_noise(out)
    annotate_run_monotonicity(out)
    json.dump(out, open(OUT, "w"), indent=2)
    print(json.dumps({"total_ratio": out["total_ratio"], "flagged": flagged}))


if __name__ == "__main__":
    main()
