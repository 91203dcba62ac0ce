#!/usr/bin/env python3
"""Parse the round-17 SECOND campaign (the shuffle-partition-posture
work) into measurement keys and MERGE them into SCALING_r17.json's
measurements block — same mechanical discipline as parse_r17_logs.py
(every artifact number scraped from a harness log, never transcribed).
Usage:
  python3 tools/parse_r17b_logs.py <logDir> [--merge]
Expects in <logDir> (each optional — absent logs are skipped with a
stderr note):
  r17b_partscale_sf01.log     PartitionScaleAB, 8-query sf0.1 set,
                              32 vs 320 at the PRE-sizing tree (the
                              cache-tax evidence that motivated
                              indexShuffleParts/buildEdges sizing)
  r17b_partscale_sf01_v2.log  same set at HEAD (operator sizing in) —
                              the posture pricing the wired decision
                              cites
  r17b_qprof_ngram_sf100.log  QueryProfile q_dedup_ngram_jaccard at
                              sf100, WIRED defaults — the spill gate
  r17b_qprof_groups_sf100.log QueryProfile q_dedup_groups at sf100,
                              WIRED defaults
Without --merge, prints the keys as JSON to stdout for inspection.
"""
import json, os, re, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_r16_logs import read  # noqa: E402
from make_scaling_r16 import annotate_noise, annotate_run_monotonicity  # noqa: E402


def partscale_multi(txt):
    """Per-query blocks of a multi-query PartitionScaleAB log. The
    single-query parser in parse_r17_logs.py attributes every pair line
    to the first RESULT; here pairs are grouped by their query token."""
    out = {}
    for m in re.finditer(
            r"\[partscale\] RESULT (\S+) partsA=(\S+) partsB=(\S+) bestA=([\d.]+) "
            r"bestB=([\d.]+) wallRatio=([\d.]+) shufA=(\d+)MB shufB=(\d+)MB "
            r"spillA=(\d+)MB spillB=(\d+)MB", txt):
        q, pa, pb, ba, bb, wr, sa, sb, spa, spb = m.groups()
        out[q] = {"parts_a": pa, "parts_b": pb,
                  "best_a_s": float(ba), "best_b_s": float(bb),
                  "wall_ratio_b_over_a": float(wr),
                  "shuffle_a_mb": int(sa), "shuffle_b_mb": int(sb),
                  "spill_a_mb": int(spa), "spill_b_mb": int(spb), "pairs": []}
    for m in re.finditer(
            r"\[partscale\] (\S+) pair=\d+ A\(\S+\)=([\d.]+) s/\d+MB/spill=(\d+)MB "
            r"B\(\S+\)=([\d.]+) s/\d+MB/spill=(\d+)MB", txt):
        q, a, sa2, b, sb2 = m.groups()
        if q in out:
            out[q]["pairs"].append({"a_s": float(a), "a_spill_mb": int(sa2),
                                    "b_s": float(b), "b_spill_mb": int(sb2)})
    return out or None


def qprof(txt):
    """Per-run totals plus the largest-stage partition counts of a
    QueryProfile log — the host-immune signals (spill bytes, task
    counts) plus the phase-sensitive walls, labeled as such."""
    runs = []
    blocks = re.split(r"(?=\[qp\] \S+ run \d+ total=)", txt)
    for b in blocks:
        h = re.match(
            r"\[qp\] (\S+) run (\d+) total=([\d.]+) s stages=(\d+) "
            r"shufWriteSum=(\d+)MB gcSum=([\d.]+) s diskSpillSum=(\d+)MB", b)
        if not h:
            continue
        tasks = [int(t) for t in re.findall(r"tasks=(\d+)", b)]
        runs.append({"query": h.group(1), "run": int(h.group(2)),
                     "wall_s": float(h.group(3)),
                     "shuffle_write_mb": int(h.group(5)),
                     "gc_s": float(h.group(6)),
                     "disk_spill_mb": int(h.group(7)),
                     "max_stage_tasks": max(tasks) if tasks else None})
    return runs or None


WHATS = {
    "index_cache_tax_sf01": (
        "why the cached exchanges are sized by the OPERATOR, not the "
        "session conf: same-JVM 32-vs-320 initialPartitionNum A/B at the "
        "pre-sizing build. AQE cannot "
        "re-plan inside a persisted plan, so under a 10x initial count "
        "the ngram ranked/perDoc caches and the CC edge cache "
        "materialized UN-coalesced — the persist-heavy pipelines priced "
        "1.28-1.55x while scan/agg queries stayed ~1.0x. (Flipping "
        "canChangeCachedPlanOutputPartitioning instead made CC's round "
        "join re-exchange the edge cache every round — 3 exchanges where "
        "the wired plan has 1 — so coalescing into caches is not the "
        "escape; explicit data-driven sizing is.)"),
    "initial_partitions_pricing_sf01": (
        "the wired-decision pricing at the shipped sizing code (the "
        "harness pins the conf per side, so the session default is out "
        "of the loop): same-JVM 32-vs-320 initialPartitionNum A/B "
        "over heavy + sub-second queries. The persist-heavy pipelines no "
        "longer care (0.90-1.04x — their cached exchanges carry their "
        "own counts), while every sub-second shuffly query pays a "
        "consistent fixed tax at 320 (map-side bucket count + fetch "
        "segmentation; B worse in 6/6 ema+tumbling pairs, +0.1-0.7 s) — "
        "so the LOCAL default stays at cores and a cluster deployment "
        "raises SPARK_GRAFT_INITIAL_PARTITIONS instead (Sessions doc). "
        "WALL CAVEAT: this log landed in a documented bad host phase "
        "(37-113 s spikes on a ~15 s query hit BOTH sides); per-pair "
        "direction and the heavy-query ratios are the signal, absolute "
        "seconds are not."),
    "index_cache_sizing_sf100": (
        "the done-gate for the r17 partition-sizing fix, at WIRED "
        "defaults (no conf flips): QueryProfile at sf100. The committed "
        "ngram_partition_scale_ab_sf100 key measured a DETERMINISTIC "
        "1032 MB disk spill at the old pinned-32 posture; with "
        "Dedup.indexShuffleParts sizing the ranked-cache exchanges from "
        "corpus stats (~210 partitions here) and buildEdges sizing the "
        "edge cache byte-proportionally from the pair count (16-byte "
        "edge rows floor at cores through sf100), disk_spill_mb is 0 in "
        "every run and max_stage_tasks shows the data-derived counts "
        "engaged. "
        "Walls in this key are NOT protocol-comparable (bad host phase, "
        "fresh JVM, no interleaved control) — the spill and task counts "
        "are the host-immune gates."),
}


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r17blogs"
    merge = "--merge" in sys.argv
    extra = {}
    t = read(logdir, "r17b_partscale_sf01.log")
    if t:
        r = partscale_multi(t)
        if r:
            extra["index_cache_tax_sf01"] = {
                "what": WHATS["index_cache_tax_sf01"], "queries": r}
    t = read(logdir, "r17b_partscale_sf01_v2.log")
    if t:
        r = partscale_multi(t)
        if r:
            extra["initial_partitions_pricing_sf01"] = {
                "what": WHATS["initial_partitions_pricing_sf01"], "queries": r}
    prof = {}
    for stem in ("r17b_qprof_ngram_sf100", "r17b_qprof_groups_sf100"):
        t = read(logdir, stem + ".log")
        if t:
            r = qprof(t)
            if r:
                prof[r[0]["query"]] = r
    if prof:
        extra["index_cache_sizing_sf100"] = {
            "what": WHATS["index_cache_sizing_sf100"], "runs": prof}
    if not merge:
        json.dump(extra, sys.stdout, indent=2)
        print()
        return
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                            "SCALING_r17.json")
    out = json.load(open(out_path))
    out["measurements"].update(extra)
    annotate_noise(out)
    annotate_run_monotonicity(out)
    json.dump(out, open(out_path, "w"), indent=2)
    print(json.dumps({"added_keys": sorted(extra.keys()),
                      "noise_flagged": out.get("noise_flagged", [])}))


if __name__ == "__main__":
    main()
