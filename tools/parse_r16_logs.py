#!/usr/bin/env python3
"""Parse the r16 measurement-campaign harness logs into the
`measurements` block consumed by make_scaling_r16.py, so the artifact
is assembled mechanically from the raw runs rather than transcribed.
Usage:
  python3 tools/parse_r16_logs.py <logDir> > /tmp/r16_extra.json
Expects in <logDir> (each optional — absent logs are skipped with a
stderr note):
  r16_decade4.log          graft.DecadeAB sf10 vs sf100
  r16_ccshape_sf01.log     graft.CcShapeAB /root/testdata/sf0.1
  r16_ccshape_sf10.log     graft.CcShapeAB /tmp/graft_sf10
  r16_ivf_sf10.log         graft.IvfDedupProfile sf10 (uniform, thr 0.4)
  r16_ivf_sf30.log         graft.IvfDedupProfile sf30 (uniform, thr 0.4)
  r16_ivf_clustered_sf1.log  clustered probe (thr 0.9, plant 4)
  r16_ivf_clustered_sf10.log clustered probe, one decade up
  r16_decont.log           graft.DecontScaleAB sf10 vs sf100
  r16_ckptrace.log         graft.CkptRaceAB sf10
  r16_bench_sf10.log       heavy-set bench (for the spread map)
"""
import json, os, re, sys


def read(logdir, name):
    p = os.path.join(logdir, name)
    if not os.path.exists(p):
        print(f"[parse] {name} missing — skipped", file=sys.stderr)
        return None
    return open(p, errors="replace").read()


def decade(txt):
    out = {}
    for m in re.finditer(
            r"\[decade\] RESULT (\S+) bestA=([\d.]+) bestB=([\d.]+) "
            r"wallRatio=([\d.]+) shufA=(\d+)MB shufB=(\d+)MB shufRatio=([\d.NA/]+)", txt):
        q, a, b, r, sa, sb, sr = m.groups()
        out[q] = {"sf10_s": float(a), "sf100_s": float(b), "wall_ratio": float(r),
                  "shuffle_sf10_mb": int(sa), "shuffle_sf100_mb": int(sb),
                  "shuffle_ratio": None if sr.startswith("N") else float(sr)}
    return out


def ccshape(txt):
    m = re.search(
        r"\[ccshape\] RESULT r13best=([\d.]+) r14best=([\d.]+) ratio=([\d.]+) "
        r"shuf r13=(\d+)MB r14=(\d+)MB stages r13=(\d+) r14=(\d+)", txt)
    if not m:
        return None
    a, b, r, sa, sb, ta, tb = m.groups()
    return {"r13_shape_best_s": float(a), "r14_shape_best_s": float(b),
            "wall_ratio_r14_over_r13": float(r),
            "shuffle_r13_mb": int(sa), "shuffle_r14_mb": int(sb),
            "stages_r13": int(ta), "stages_r14": int(tb)}


def ivf(txt):
    out = {}
    # refuse to min-merge a concatenated log whose runs came from
    # different kernel generations (the [ivfprof] gen= marker): per-tag
    # "bests" must never mix two different operators
    gens = set(re.findall(r"\[ivfprof\].*\bgen=(\S+)", txt))
    if len(gens) > 1:
        raise SystemExit(f"[parse] ivfprof log mixes kernel generations {sorted(gens)} "
                         "— split the log per generation before parsing")
    if gens:
        out["kernel_gen"] = gens.pop()
    # refuse a concatenated log whose runs came from different REGIMES
    # (threshold/plantCopies/eps/sfDir — ADVICE r16: the gen gate alone
    # let same-gen runs from different configs min-merge under one tag
    # while reporting only the first header's config)
    headers = set(re.findall(
        r"\[ivfprof\] (\S+ n=\d+ threshold=[\d.]+ plantCopies=\d+ eps=[\d.]+)", txt))
    if len(headers) > 1:
        raise SystemExit(f"[parse] ivfprof log mixes regimes {sorted(headers)} "
                         "— split the log per (sfDir, threshold, plantCopies, eps) "
                         "before parsing")
    h = re.search(r"\[ivfprof\] (\S+) n=(\d+) threshold=([\d.]+) plantCopies=(\d+) "
                  r"eps=([\d.]+) sampled=(\w+) exact_pairs=(\d+)", txt)
    if h:
        out["config"] = {"sf_dir": h.group(1), "n_vectors": int(h.group(2)),
                         "threshold": float(h.group(3)), "plant_copies": int(h.group(4)),
                         "eps": float(h.group(5)), "sampled_exact": h.group(6) == "true",
                         "exact_pairs": int(h.group(7))}
    else:  # pre-r16 header (no threshold fields)
        h2 = re.search(r"\[ivfprof\] (\S+) n=(\d+) sampled=(\w+) exact_pairs=(\d+)", txt)
        if h2:
            out["config"] = {"sf_dir": h2.group(1), "n_vectors": int(h2.group(2)),
                             "threshold": 0.4, "sampled_exact": h2.group(3) == "true",
                             "exact_pairs": int(h2.group(4))}
    runs = {}
    for m in re.finditer(
            r"\[ivfprof\] (.+?) recall=([\d.]+) precision=([\d.]+) "
            r"wall=\s*([\d.]+) s shuffle=(\d+)MB pairs=(\d+)", txt):
        tag, rec, prec, wall, mb, pairs = m.groups()
        r = {"recall": float(rec), "precision": float(prec),
             "wall_s": float(wall), "shuffle_mb": int(mb), "pairs": int(pairs)}
        # a concatenated log (base grid + follow-up sweep over the same
        # corpus/truth) repeats the `lsh` baseline: keep the best wall,
        # the same best-of protocol every harness uses
        t = tag.strip()
        if t not in runs or r["wall_s"] < runs[t]["wall_s"]:
            runs[t] = r
    if runs:
        out["runs"] = runs
    return out or None


def decont(txt):
    m = re.search(
        r"\[decont\] RESULT fixed-eval bestA=([\d.]+) bestB=([\d.]+) "
        r"wallRatio=([\d.]+) shufA=(\d+)MB shufB=(\d+)MB rowsA=(\d+) rowsB=(\d+)", txt)
    if not m:
        return None
    a, b, r, sa, sb, ra, rb = m.groups()
    return {"sf10_s": float(a), "sf100_s": float(b), "wall_ratio": float(r),
            "shuffle_sf10_mb": int(sa), "shuffle_sf100_mb": int(sb),
            "flagged_rows_sf10": int(ra), "flagged_rows_sf100": int(rb)}


def ckptrace(txt):
    m = re.search(
        r"\[ckptrace\] SUMMARY lazyA best=([\d.]+) worst=([\d.]+) "
        r"eagerB best=([\d.]+) worst=([\d.]+) bestRatioB/A=([\d.]+) "
        r"shufMB A=([\d.]+) B=([\d.]+)", txt)
    if not m:
        return None
    ab, aw, bb, bw, r, sa, sb = (float(g) for g in m.groups())
    return {"lazy_best_s": ab, "lazy_worst_s": aw, "eager_best_s": bb,
            "eager_worst_s": bw, "best_ratio_eager_over_lazy": r,
            "shuffle_lazy_mb": sa, "shuffle_eager_mb": sb}


def spreads(txt):
    m = list(re.finditer(r"\[bench\] spread=(\{.*\})", txt))
    return json.loads(m[-1].group(1)) if m else None


def main():
    logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp"
    extra = {}
    t = read(logdir, "r16_decade4.log")
    if t:
        extra["fourth_decade_sf10_to_sf100"] = {
            "what": "12 non-output-bound heavy queries, interleaved "
                    "same-JVM pairs (DecadeAB), post-audit HEAD — the "
                    "r15 race cannot contribute; 10x rows per side",
            "queries": decade(t)}
    for name, key, what in [
            ("r16_ccshape_sf01.log", "cc_shape_ab_sf01", "sf0.1, 4 pairs"),
            ("r16_ccshape_sf10.log", "cc_shape_ab_sf10", "sf10, 3 pairs")]:
        t = read(logdir, name)
        if t:
            r = ccshape(t)
            if r:
                r["what"] = ("r13 two-join propagation shape vs shipped r14 "
                             "fused shape over the same materialized pair set, "
                             "interleaved same-JVM; " + what)
                extra[key] = r
    for name, key, what in [
            ("r16_ivf_sf10.log", "lsh_vs_ivf_sf10",
             "uniform corpus, threshold 0.4 (hardest regime), sampled-exact "
             "truth; probes 4-64 at cellFactor 1"),
            ("r16_ivf_sf30.log", "lsh_vs_ivf_sf30",
             "third embedding decade, threshold 0.4, sampled-exact truth; "
             "probes 8/32/64 at cellFactor 1"),
            ("r16_ivf_clustered_sf1.log", "lsh_vs_ivf_clustered_sf1",
             "CLUSTERED high-threshold regime (verdict r15 item 5): 4 planted "
             "copies per vector at eps=0.3 (within-cluster cos ~0.92), "
             "threshold 0.9, probes 1/2/4 — the production near-dup case"),
            ("r16_ivf_clustered_sf10.log", "lsh_vs_ivf_clustered_sf10",
             "same clustered probe one decade up (800k vectors), plus the "
             "cellFactor sweep (cf 2/4/8 at probes 4) — more cells cut the "
             "in-cell O(pop^2) prefilter CPU that dominates IVF wall at "
             "cf=1 while tight >=0.9 clusters keep co-assigning"),
            ("r16_ivf2_clustered_sf10.log", "lsh_vs_ivf_clustered_sf10_twolevel_sp4",
             "clustered regime re-measured AFTER the r16 ProbeCells kernel "
             "landed (bounded top-p selection + two-level supercluster "
             "pruning), fixed superProbes=4: p=1/2 recall bit-identical to "
             "flat at ~2.2x less wall; p=4 recall dips 0.959->0.884 (3rd/"
             "4th probe cells outside the top-4 superclusters)"),
            ("r16_ivf2_sf10.log", "lsh_vs_ivf_sf10_twolevel_sp4",
             "uniform thr-0.4 regime at fixed superProbes=4 — the run that "
             "killed the fixed default: low-threshold neighbors spread "
             "their top-p cells over ~p superclusters, so sp=4 gutted "
             "p=32 recall 0.953->0.649 and made p=64 WORSE than p=32; "
             "motivated the shipped auto rule sp=max(4, 2*probes)"),
            ("r16_ivf3_clustered_sf10.log", "lsh_vs_ivf_clustered_sf10_twolevel_auto",
             "clustered regime at the SHIPPED auto rule (sp=0 -> "
             "max(4,2p)) with an explicit sp 8/16 sweep at each p"),
            ("r16_ivf3_sf30.log", "lsh_vs_ivf_sf30_twolevel_auto",
             "third embedding decade re-measured at the shipped kernel: at "
             "18.7k cells (population-bound sizing) the r15 shape "
             "full-sorted 18.7k struct scores per vector — bounded "
             "selection prices that removal; pruning itself cannot help "
             "at p >= sqrt(nCells) (structural, see the operator scaladoc)"),
            ("r16_ivf3_sf10.log", "lsh_vs_ivf_sf10_twolevel_auto",
             "uniform thr-0.4 regime at the shipped auto rule — at "
             "p >= sqrt(nCells) auto degrades to probing every "
             "supercluster (flat-equivalent output), so recall must match "
             "the pre-kernel sweep while wall prices the sort_array "
             "removal alone")]:
        t = read(logdir, name)
        if t:
            r = ivf(t)
            if r:
                r["what"] = what
                extra[key] = r
    t = read(logdir, "r16_decont.log")
    if t:
        r = decont(t)
        if r:
            r["what"] = ("fixed eval set (dirA's %7==0 slice) vs growing corpus, "
                         "sf10 -> sf100, interleaved (DecontScaleAB); same-source "
                         "premise gated in-harness")
            extra["decontaminate_fixed_eval_decade"] = r
    t = read(logdir, "r16_ckptrace.log")
    if t:
        r = ckptrace(t)
        if r:
            r["what"] = ("lazy vs eager toks checkpoint in dedupSpans at sf10, "
                         "interleaved same-JVM (CkptRaceAB) — prices the r16 "
                         "audit on its heaviest flipped site; a racing lazy run "
                         "shows as wall above eager at identical logical work, "
                         "and lazy worst-vs-best spread is the race signature")
            extra["ckpt_race_ab_dedup_spans_sf10"] = r
    t = read(logdir, "r16_bench_sf10.log")
    if t:
        s = spreads(t)
        if s:
            extra["sf10_bench_spread_s"] = {
                "what": "per-query max-min spread in SECONDS across the 5 timed "
                        "sf10 runs "
                        "(quiet host) — the post-race-fix answer to the "
                        "r12/r13 'day-scale bimodality' story on the "
                        "dedup/corpus family (r13 recorded an 89.5 s best-of-5 "
                        "spread on q_dedup_groups at sf10 and an 18.4-vs-4.3 s "
                        "suite-vs-isolated split on tfidf). READING: "
                        "q_dedup_groups' spread collapsed 89.5 -> 2.6 s, the "
                        "race term the r15 fix removed; the corpus family "
                        "still spreads 7-44 s, and ckpt_race_ab shows the "
                        "SAME spike hitting lazy and eager sides of one "
                        "interleaved pair (A3=27.3 s, B3=30.9 s at identical "
                        "956 MB shuffle) — the residual is host phase, not "
                        "plan nondeterminism, so cross-session absolute walls "
                        "stay incomparable and interleaved ratios stay the "
                        "protocol",
                "spread": s}
    json.dump(extra, sys.stdout, indent=2)
    print()


if __name__ == "__main__":
    main()
