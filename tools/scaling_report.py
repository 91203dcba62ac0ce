#!/usr/bin/env python3
"""Build the scaling artifact (dev tool): join two Bench JSON lines
(e.g. baseline sf1, scaled sf10) into per-query ratios. A ratio near the
data scale factor (10x) is linear scaling; the artifact flags anything
above `factor * tolerance` as super-linear. Tolerance defaults to 1.0 —
anything above the data factor itself gets flagged (r8's 1.5 headroom
let a real 11.75x slip the flag; better a flag that needs a written
explanation than a silent pass).

Usage: python3 tools/scaling_report.py <baseJson> <scaledJson> <outJson> [factor] [tolerance]
"""
import sys, json


def main(base_path, scaled_path, out_path, factor=10.0, tolerance=1.0):
    base = json.load(open(base_path))
    scaled = json.load(open(scaled_path))
    rows = {}
    flagged = []
    for name, t1 in sorted(scaled["queries"].items()):
        t0 = base["queries"].get(name)
        if t0 is None or t0 <= 0 or t1 <= 0:
            continue
        ratio = round(t1 / t0, 2)
        rows[name] = {"base_s": t0, "scaled_s": t1, "ratio": ratio}
        # sub-second baselines are dominated by fixed task-setup cost, so
        # their ratio UNDERSTATES efficiency; only flag real workloads
        if ratio > factor * tolerance:
            flagged.append(name)
    out = {
        "factor": factor,
        "queries": rows,
        "base_sf": base.get("sf"),
        "scaled_sf": scaled.get("sf"),
        "total_base_s": base["value"],
        "total_scaled_s": scaled["value"],
        "total_ratio": round(scaled["value"] / base["value"], 2),
        "superlinear_flagged": flagged,
    }
    json.dump(out, open(out_path, "w"), indent=1)
    for name, r in sorted(rows.items(), key=lambda kv: -kv[1]["ratio"]):
        print(f"{r['ratio']:6.2f}x  {r['base_s']:7.2f} -> {r['scaled_s']:7.2f}  {name}")
    print(f"\ntotal {out['total_ratio']}x ({base['value']} -> {scaled['value']} s), "
          f"flagged super-linear (> {factor * tolerance}x): {flagged or 'none'}")


if __name__ == "__main__":
    a = sys.argv
    main(a[1], a[2], a[3],
         float(a[4]) if len(a) > 4 else 10.0,
         float(a[5]) if len(a) > 5 else 1.0)
