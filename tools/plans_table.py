#!/usr/bin/env python3
"""Regenerate the PLANS.md scale-ratio table from BENCH_DETAIL.json.

Round-7 VERDICT item 6: the PLANS.md table must match the measured
artifact to 2 decimals, machine-generated rather than hand-transcribed.

Usage: python3 tools/plans_table.py [BENCH_DETAIL.json] [--bytes]
Prints the markdown table (one row per scale lane, sorted by the
largest-factor ratio ascending — design-evidence lanes first).
With --bytes, prints the shuffle-write MB table from scale_shuffle_mb
instead of wall-time ratios.
"""
import json, sys


def bytes_table(path):
    d = json.load(open(path))
    io = d.get("scale_shuffle_mb") or {}
    factors = (d.get("scale") or {}).get("factors") or []
    cols = ["x1"] + [f"x{f}" for f in factors]
    lanes = sorted({k.split(".", 1)[1] for k in io})
    rows = []
    for lane in lanes:
        vals = [io.get(f"{c}.{lane}") for c in cols]
        if any(v is None for v in vals):
            continue
        ratio = vals[-1] / vals[0] if vals[0] > 0 else float("nan")
        rows.append((lane, vals, ratio))
    rows.sort(key=lambda r: r[2])
    print("| lane | " + " | ".join(f"{c} MB" for c in cols) +
          f" | {cols[-1]}/x1 |")
    print("|" + "---|" * (2 + len(cols)))
    for lane, vals, ratio in rows:
        print(f"| {lane} | " + " | ".join(f"{v:.2f}" for v in vals) +
              f" | {ratio:.1f} |")
    return 0

def main(path):
    d = json.load(open(path))
    sc = d.get("scale") or {}
    factors = sc.get("factors") or []
    if not factors:
        print("no scale block in", path); return 1
    x1 = sc.get("x1") or {}
    cols = [f"x{f}" for f in factors]
    lanes = [k for k in x1 if all(k in (sc.get(c) or {}) for c in cols)]
    rows = []
    for lane in lanes:
        base = x1[lane]
        ratios = [((sc[c][lane] / base) if base > 0 else float("nan"))
                  for c in cols]
        rows.append((lane, base, ratios))
    rows.sort(key=lambda r: r[2][-1])
    hdr = "| lane | x1 sec | " + " | ".join(
        f"x{f} ratio" for f in factors) + " |"
    print(hdr)
    print("|" + "---|" * (2 + len(factors)))
    for lane, base, ratios in rows:
        print(f"| {lane} | {base:.2f} | " +
              " | ".join(f"{r:.2f}" for r in ratios) + " |")
    missing = [k for k in set().union(*(sc.get(c, {}) for c in cols))
               if k not in lanes] if cols else []
    if missing:
        print()
        print("lanes missing a scale point (see errors in the artifact): " +
              ", ".join(sorted(missing)))
    return 0

if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--bytes"]
    path = args[0] if args else "BENCH_DETAIL.json"
    if "--bytes" in sys.argv[1:]:
        sys.exit(bytes_table(path))
    sys.exit(main(path))
