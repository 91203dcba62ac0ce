#!/usr/bin/env python3
"""Parse the r17 measurement-campaign harness logs into the
`measurements` block consumed by make_scaling_r17.py — same mechanical
discipline as r16 (every artifact number scraped from a committed
harness log, never transcribed). Usage:
  python3 tools/parse_r17_logs.py <logDir> > /tmp/r17_extra.json
Expects in <logDir> (each optional — absent logs are skipped with a
stderr note):
  r17_bench_sf01_A.log/.err  full 68-query sf0.1 bench, quiet-host
  r17_bench_sf01_B.log/.err    re-land run A and B (verdict item 1)
  r17_bench_sf10.log/.err    heavy-set sf10 re-land (5 runs + spread)
  r17_ivffit.log             graft.IvfFitAB flat-vs-hier fit walls
  r17_ivf_knee.log           IvfDedupProfile at p ~ sqrt(nCells)/2
  r17_ivf_1e5.log            IvfDedupProfile at nCells >= 1e5 (hier fit)
  r17_ivf_sf30_auto.log      sf30 uniform re-run at the hier fit
  r17_ccrounds.log           graft.CcRoundsAB sf10 vs sf100
Bench .err files carry the per-query spread map; .log carries the JSON
line — both are consumed.
"""
import json, os, re, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from parse_r16_logs import ivf, read  # noqa: E402


def read2(logdir, stem):
    """Concatenate <stem>.log and <stem>.err (the r17 campaign splits
    stdout/stderr; the bench spread map lands on stderr)."""
    parts = [read(logdir, stem + ext) for ext in (".log", ".err")]
    parts = [p for p in parts if p]
    return "\n".join(parts) if parts else None


def bench_json(txt):
    for line in reversed(txt.splitlines()):
        if line.startswith('{"metric"'):
            return json.loads(line)
    return None


def bench_spread(txt):
    m = list(re.finditer(r"\[bench\] spread=(\{.*\})", txt))
    return json.loads(m[-1].group(1)) if m else None


def ivffit(txt):
    out = {}
    h = re.search(r"\[ivffit\] (\S+) n=(\d+) flatMax=(\d+) gen=(\S+)", txt)
    if h:
        out["config"] = {"sf_dir": h.group(1), "n_vectors": int(h.group(2)),
                         "flat_max_cells": int(h.group(3)), "gen": h.group(4)}
    grid = {}
    for m in re.finditer(
            r"\[ivffit\] nCells=(\d+) cells=(\d+) hier=([\d.]+) "
            r"flat=([\d.]+|skipped) meanNorm hier=([\d.]+) flat=([\d.]+|n/a)", txt):
        nc, cells, hier, flat, mnh, mnf = m.groups()
        grid[nc] = {"cells": int(cells), "hier_fit_s": float(hier),
                    "flat_fit_s": None if flat == "skipped" else float(flat),
                    "mean_norm_hier": float(mnh),
                    "mean_norm_flat": None if mnf == "n/a" else float(mnf)}
    if grid:
        out["by_ncells"] = grid
        # run-level sanity, same discipline as annotate_run_monotonicity:
        # hier fit wall should be non-decreasing in nCells (the driver
        # arithmetic is); where it is not, the wall is dominated by the
        # Spark sample-draw job, whose scheduling noise exceeds the
        # sub-second fit — flag it in-key so a reader cannot conclude
        # the fit gets cheaper with more cells
        pts = sorted((int(k), v["hier_fit_s"]) for k, v in grid.items())
        inv = [(a, b) for a, b in zip(pts, pts[1:]) if b[1] < a[1]]
        if inv:
            out["noise_note"] = [
                f"hier wall not monotone in nCells ({b[0]} {b[1]}s < {a[0]} "
                f"{a[1]}s): below ~1e5 cells the wall is dominated by the "
                "Spark sample-draw job, not fit arithmetic — read the FLAT "
                "column's growth (the quadratic being escaped) and the "
                "large-nCells hier points; small-nCells hier deltas are "
                "job-scheduling noise" for a, b in inv]
    return out or None


def ccrounds(txt):
    out = {}
    for m in re.finditer(
            r"\[ccrounds\] RESULT (\S+) bestA=([\d.]+) bestB=([\d.]+) "
            r"wallRatio=([\d.]+) roundsA=(\d+) roundsB=(\d+) roundsRatio=([\d.NA/]+) "
            r"ccA=([\d.]+) ccB=([\d.]+) ccRatio=([\d.NA/]+) "
            r"shufA=(\d+)MB shufB=(\d+)MB restA=([\d.-]+) restB=([\d.-]+)", txt):
        (q, a, b, wr, ra, rb, rr, ca, cb, cr, sa, sb, xa, xb) = m.groups()
        out[q] = {"sf10_s": float(a), "sf100_s": float(b), "wall_ratio": float(wr),
                  "rounds_sf10": int(ra), "rounds_sf100": int(rb),
                  "rounds_ratio": None if rr.startswith("N") else float(rr),
                  "cc_rounds_sf10_s": float(ca), "cc_rounds_sf100_s": float(cb),
                  "cc_ratio": None if cr.startswith("N") else float(cr),
                  "shuffle_sf10_mb": int(sa), "shuffle_sf100_mb": int(sb),
                  "rest_sf10_s": float(xa), "rest_sf100_s": float(xb)}
    # per-round walls of the BEST pair are not tracked per-run in the
    # RESULT line; attach the last printed per-round vectors per query
    per = {}
    for m in re.finditer(
            r"\[ccrounds\] (\S+) pair=\d+ perRoundA=([\d.,]+) perRoundB=([\d.,]+)", txt):
        per[m.group(1)] = {
            "per_round_sf10_s": [float(x) for x in m.group(2).split(",")],
            "per_round_sf100_s": [float(x) for x in m.group(3).split(",")]}
    for q, v in per.items():
        if q in out:
            out[q].update(v)
    return out or None


def partscale(txt):
    # side specs may carry a "+cacheaqe" suffix since r17b — match any
    # non-space spec and keep ints only for plain digit sides, so a
    # suffixed log cannot silently fail to parse (ADVICE r17)
    m = re.search(
        r"\[partscale\] RESULT (\S+) partsA=(\S+) partsB=(\S+) bestA=([\d.]+) "
        r"bestB=([\d.]+) wallRatio=([\d.]+) shufA=(\d+)MB shufB=(\d+)MB "
        r"spillA=(\d+)MB spillB=(\d+)MB", txt)
    if not m:
        return None
    q, pa, pb, ba, bb, wr, sa, sb, spa, spb = m.groups()
    out = {"query": q,
           "parts_a": int(pa) if pa.isdigit() else pa,
           "parts_b": int(pb) if pb.isdigit() else pb,
           "best_a_s": float(ba), "best_b_s": float(bb),
           "wall_ratio_b_over_a": float(wr),
           "shuffle_a_mb": int(sa), "shuffle_b_mb": int(sb),
           "spill_a_mb": int(spa), "spill_b_mb": int(spb)}
    pairs = re.findall(
        r"\[partscale\] \S+ pair=\d+ A\([^)]+\)=([\d.]+) s/\d+MB/spill=(\d+)MB "
        r"B\([^)]+\)=([\d.]+) s/\d+MB/spill=(\d+)MB", txt)
    out["pairs"] = [{"a_s": float(a), "a_spill_mb": int(sa2),
                     "b_s": float(b), "b_spill_mb": int(sb2)}
                    for a, sa2, b, sb2 in pairs]
    return out


def reland(logdir):
    """The verdict-item-1 adjudication: per-query ratios of the r17
    quiet-host best-of-2 against the committed r15/r16 bench lines,
    computed mechanically from the three JSON lines."""
    runs = {}
    for tag in ("A", "B"):
        t = read2(logdir, f"r17_bench_sf01_{tag}")
        if t:
            j = bench_json(t)
            if j:
                runs[tag] = j
    if not runs:
        return None
    refs = {}
    for rnd in (15, 16):
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                         f"BENCH_r{rnd}.json")
        d = json.load(open(p))
        m = re.search(r'\{"metric".*', d["tail"])
        refs[rnd] = json.loads(m.group(0))
    best = {}
    for j in runs.values():
        for q, v in j["queries"].items():
            best[q] = min(best.get(q, 1 << 30), v)
    out = {"totals_s": {tag: j["value"] for tag, j in runs.items()},
           "best_of_2_total_s": round(sum(best.values()) / 1000.0, 3)}
    for rnd, ref in refs.items():
        rq = ref["queries"]
        ratios = sorted(best[q] / rq[q] for q in best if q in rq and rq[q] > 0)
        out[f"median_per_query_ratio_vs_r{rnd}"] = round(
            ratios[len(ratios) // 2], 3)
        out[f"r{rnd}_total_s"] = ref["value"]
    return out


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r17logs"
    extra = {}
    r = reland(logdir)
    if r:
        r["what"] = ("verdict item 1: quiet-host re-land of the full sf0.1 "
                     "bench, two fresh-JVM runs at r16 HEAD, best-of-2 per "
                     "query compared against the committed r15/r16 lines. "
                     "READING: the r16 1.10x regression does NOT reproduce — "
                     "median per-query best-of-2/r16 is below 1.0 and "
                     "best-of-2/r15 is ~1.02, so the r16 upshift was host "
                     "phase, and the r16 eager-flip price at sf0.1 is ~2% "
                     "median upper bound (best-of-2 vs r15's committed "
                     "best-of-N, so part of even that is protocol), "
                     "not 5-10%")
        extra["reland_sf01_bench"] = r
    t = read(logdir, "r17_ivffit.log")
    if t:
        r = ivffit(t)
        if r:
            r["what"] = ("verdict item 2: IVF coarse-fit wall, flat r16 "
                         "Lloyd (O(nCells^2*dim) driver-local, single-thread) "
                         "vs r17 hierarchical fit (sqrt(nCells) supers from "
                         "the bounded sample, then per-super cells from "
                         "per-super members; O(nCells^1.5*dim) parallel) — "
                         "same deterministic hash-draw sample both sides, "
                         "same scoring rule; meanNorm is the sanity proxy "
                         "that both fits produce comparably-scaled matrices")
            extra["ivf_fit_ab"] = r
    for stem, key, what in [
            ("r17_ivf_knee", "lsh_vs_ivf_sf10_knee",
             "ADVICE r16 item 2 / verdict item 3: the two-level knee probed "
             "AT p ~ sqrt(nCells)/2 (uniform thr-0.4 corpus) with an "
             "explicit superProbes sweep incl. the auto rule (sp=0 -> "
             "max(4,2p), which at this p probes every supercluster = "
             "flat-equivalent output) — derives the auto rule and the "
             "1024-cell threshold from data at the boundary instead of "
             "argument"),
            ("r17_ivf_1e5", "ivf_ncells_1e5_clustered",
             "verdict item 2 done-gate: end-to-end embeddingNearDupsIvf at "
             "nCells >= 1e5 (clustered >=0.9 regime, 4 planted copies, "
             "800k vectors, cf sized to force 1e5 cells) — completes with "
             "bounded driver fit time only because the hierarchical fit "
             "landed; recall/precision/wall/shuffle as usual"),
            ("r17_ivf_sf30_auto", "lsh_vs_ivf_sf30_hierfit",
             "sf30 uniform thr-0.4 re-run at the r17 HIERARCHICAL fit "
             "(18.7k cells > the 4096 hier threshold, so this config's "
             "centroids now come from the two-level fit): compare recall "
             "to SCALING_r16 lsh_vs_ivf_sf30_twolevel_auto to price the "
             "fit change's recall impact at held wall")]:
        t = read(logdir, stem + ".log")
        if t:
            r = ivf(t)
            if r:
                r["what"] = what
                extra[key] = r
    t = read(logdir, "r17_ccrounds.log")
    if t:
        r = ccrounds(t)
        if r:
            extra["cc_rounds_ab_sf10_to_sf100"] = {
                "what": ("verdict item 5: attributes the fourth-decade CC "
                         "wall excess (11.3x wall at 9.9x shuffle) by "
                         "interleaving sf10/sf100 in one JVM while the "
                         "roundHook times every propagation/contraction "
                         "round — rounds_ratio isolates diameter growth, "
                         "cc_ratio the per-round cost, rest_* the "
                         "pair-derivation + edge-build share that scales "
                         "with data but not diameter. CAVEAT: interleaving "
                         "cancels phase between the two SIDES of one query, "
                         "not BETWEEN queries — the groups-vs-star rest_sf100 "
                         "split (both queries derive the identical pair set "
                         "at identical shuffle bytes) is therefore a "
                         "cross-block phase term, and only within-query "
                         "numbers are protocol-comparable. SECOND CAVEAT "
                         "(r17 review): per_round_* vectors come from the "
                         "LAST printed pair while every scalar comes from "
                         "the BEST pair, so sum(per_round_*) need not equal "
                         "cc_rounds_*_s — use the vectors for round SHAPE "
                         "(count, relative weight), the scalars for "
                         "magnitude"),
                "queries": r}
    t = read(logdir, "r17_partscale.log")
    if t:
        r = partscale(t)
        if r:
            r["what"] = ("the follow-up to cc_rounds_ab: QueryProfile located "
                         "the pair-derivation decade excess in the "
                         "doc_id-window + set-aggregate stage (cpu 110 -> "
                         "2159 s for 10x rows, 1032 MB disk spill appearing "
                         "at sf100) — per-partition bytes grow 10x per decade "
                         "at the harness-pinned 32 shuffle partitions. This "
                         "same-JVM interleaved A/B flips only "
                         "spark.sql.shuffle.partitions (a runtime conf): the "
                         "spill vanishes DETERMINISTICALLY on the scaled side "
                         "(0 MB in every pair) and best wall improves, at "
                         "~15% more shuffle bytes from finer partitions. "
                         "READING: the superlinear decade term is partition "
                         "SIZING, a local-harness artifact — a real cluster "
                         "scales partitions with data (Sessions' 'AQE "
                         "coalesces' premise), so the operator's decade "
                         "behavior is linear shuffle + bounded per-partition "
                         "memory; the wall ratio itself is phase-noisy "
                         "(pair 1 inverted), the spill column is the "
                         "structural signal")
            extra["ngram_partition_scale_ab_sf100"] = r
    t = read2(logdir, "r17_bench_sf10")
    if t:
        s = bench_spread(t)
        if s:
            extra["sf10_bench_spread_s"] = {
                "what": ("per-query max-min spread in SECONDS across the 5 "
                         "timed sf10 runs of the r17 quiet-host re-land — "
                         "feeds the same noise flagger as r16; entries whose "
                         "spread exceeds their best wall are flagged in "
                         "noise_flagged"),
                "spread": s}
    json.dump(extra, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
