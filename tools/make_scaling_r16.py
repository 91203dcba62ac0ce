#!/usr/bin/env python3
"""Assemble SCALING_r16.json from the round-16 heavy-set bench logs
(sf1 vs sf10, best-of-5 — the r10 protocol; see SCALING_r10 notes for
the convergence measurements that justify it). Usage:
  python3 tools/make_scaling_r16.py <sf1Json> <sf10Json> [extraJson]
extraJson (optional) is merged verbatim under "measurements" — this
round: the FOURTH decade (sf10 -> sf100) re-measured at post-audit
HEAD (every lazy localCheckpoint either flipped eager or proven safe,
so the r15 double-evaluation race cannot enter these numbers); the CC
round-fusion adjudication (CcShapeAB, r13 shape vs shipped r14 shape
over the same materialized pair set, sf0.1 and sf10); the embedding
near-dup LSH-vs-IVF adjudication at sf10 and sf30 (sf100 stays out of
scope for the embedding family because its OUTPUT grows quadratically
at this corpus's 0.4 threshold — r13 measured 8.95x pairs for 3x
vectors); the NEW clustered high-threshold probe (threshold 0.9,
planted 4-copy clusters, probes 1/2/4 — the regime IVF's structural
advantage is claimed for, untested until now); the fixed-eval
decontamination decade; and the lazy-vs-eager checkpoint race A/B
(CkptRaceAB) that prices this round's audit on its heaviest flipped
site.

Bench emits per-query times in integer MILLISECONDS since r11
("qunit":"ms"); this tool converts back to seconds so SCALING_r16
stays unit-compatible with r8-r15.

Merge mode:
  python3 tools/make_scaling_r16.py --merge <extraJson>
keeps the already-landed heavy-set queries block untouched and
replaces ONLY the "measurements" block with extraJson (the
parse_r16_logs.py output) — used when the adjudication campaign
completes after the sf1/sf10 bench logs have been consumed, so the
blessed ratios are not re-measured just to attach the campaign.
"""
import sys, json

NOTES = {
    "method": "14-query heavy set (dedup/corpus/groups/decontaminate/"
        "tfidf/spans family + embedding_lsh + embedding_ivf + "
        "corpus_clean_full), sf10 = ScaleUp 100x of /root/testdata/"
        "sf0.1, local[32], 64g heap, machine otherwise idle. Queries "
        "absent from the set (e.g. q_dedup_embedding) are the "
        "documented O(n^2) oracle twins, out of scope by design. "
        "Measured at post-audit, post-ProbeCells HEAD (r16): every lazy "
        "localCheckpoint is either eager or carries a proof it cannot "
        "race (so these ratios are free of the r15 double-evaluation "
        "artifact), and the embedding_ivf entries price the shipped "
        "two-level probe kernel, same code as the measurements block's "
        "*_twolevel_* keys.",
    "protocol": "best-of-FIVE timed runs per query (r10 protocol), "
        "cache-honest since r13 (CacheManager cleared + blocking "
        "unpersist before every timed run; the BENCH JSON line carries "
        "a 'proto' field — full tag on stderr — so series readers see "
        "the r13 break). Compare sf1:sf10 RATIOS, never absolute "
        "seconds across rounds. The fourth-decade and adjudication "
        "numbers use a DIFFERENT protocol by design: DecadeAB/CcShapeAB/"
        "CkptRaceAB/DecontScaleAB alternate each measurement between "
        "the two sides inside one JVM (warm per side first), so the "
        "ratio is taken between runs executed seconds apart under the "
        "same host phase — the documented day-scale bimodality "
        "(r12/r13) cannot enter an interleaved ratio; per-run "
        "shuffle-write MB (min across pairs, first-successful-attempt "
        "stage filter, deduped by stageId) is the noise-immune "
        "secondary signal.",
}


def annotate_noise(out):
    """Flag queries whose best-of-5 sf10 SPREAD exceeds their best wall:
    such a ratio was taken inside a host phase swing and must be read
    against the interleaved fourth-decade block, not as a plan property
    (the corpus family measured a 40.7 s spread on a 15.3 s best in the
    r16 re-land). Runs in --merge mode, where the spread map is present.
    """
    spread = (out.get("measurements", {})
              .get("sf10_bench_spread_s", {}).get("spread", {}))
    flagged = sorted(
        q for q, v in out.get("queries", {}).items()
        if spread.get(q, 0.0) > v["sf10_s"])
    if flagged:
        out["noise_flagged"] = flagged
        out["noise_flagged_note"] = (
            "sf10 best-of-5 spread EXCEEDS the best wall for these "
            "queries: their committed ratios carry a host-phase term; "
            "the interleaved measurements (fourth_decade_sf10_to_sf100) "
            "are the steady-state reference for them")


def annotate_run_monotonicity(out):
    """Run-level sanity check for the measurements block (r17, verdict
    r16 item 3): within one ivfprof key, at fixed (cf, sp), wall must be
    non-decreasing in probes — more probes is strictly more assignment
    AND more candidate-verify work (auto sp also grows with p), so an
    inversion is a host-phase term INSIDE the block, not a property of
    the operator. Each affected key gets a mechanically-generated
    in-key `noise_note` naming the inverted pair, so a reader of that
    key alone cannot conclude probes are free.
    """
    tag_re = __import__("re").compile(
        r"ivf p=(\d+) cf=([\d.]+)(?: sp=(\d+))?$")
    for key, block in out.get("measurements", {}).items():
        runs = block.get("runs") if isinstance(block, dict) else None
        if not runs:
            continue
        groups = {}
        for tag, r in runs.items():
            m = tag_re.match(tag)
            if m:
                p, cf, sp = int(m.group(1)), m.group(2), m.group(3) or "auto"
                groups.setdefault((cf, sp), []).append((p, r["wall_s"]))
        notes = []
        for (cf, sp), pts in sorted(groups.items()):
            pts.sort()
            for (p1, w1), (p2, w2) in zip(pts, pts[1:]):
                if w2 < w1:
                    notes.append(
                        f"wall not monotone in probes at cf={cf} sp={sp} "
                        f"(p={p2} {w2}s < p={p1} {w1}s): more probes is "
                        "strictly more assignment+verify work, so this "
                        "inversion is a host-phase term inside the block — "
                        "read ratios within one p, never across probes here")
        if notes:
            block["noise_note"] = notes


def qsecs(bench):
    """Per-query seconds from a bench JSON of either unit generation."""
    ms = bench.get("qunit") == "ms"
    return {q: (v / 1000.0 if ms else v) for q, v in bench["queries"].items()}


def main():
    if sys.argv[1] == "--merge":
        out = json.load(open("SCALING_r16.json"))
        out["measurements"] = json.load(open(sys.argv[2]))
        annotate_noise(out)
        annotate_run_monotonicity(out)
        json.dump(out, open("SCALING_r16.json", "w"), indent=2)
        print(json.dumps({"merged_keys": sorted(out["measurements"].keys()),
                          "noise_flagged": out.get("noise_flagged", [])}))
        return
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
        "decade": "sf1 -> sf10 (second decade, re-measured at r16 "
                  "post-audit HEAD; r8 covered sf0.1 -> sf1, r13 probed "
                  "sf10 -> sf30, and the measurements block carries the "
                  "re-measured FOURTH decade sf10 -> sf100 plus the "
                  "CC-fusion, LSH-vs-IVF (uniform AND clustered "
                  "regimes), decontamination, and checkpoint-race "
                  "adjudications)",
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
    json.dump(out, open("SCALING_r16.json", "w"), indent=2)
    print(json.dumps({"total_ratio": out["total_ratio"],
                      "flagged": flagged}, indent=None))


if __name__ == "__main__":
    main()
