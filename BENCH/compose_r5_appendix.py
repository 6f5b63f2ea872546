#!/usr/bin/env python
"""Print the round-5 campaign per-round disclosure table from
BENCH/raw/<prefix>_{lo,hi}N.json — markdown rows for the hand-written
appendix of BENCH/BASELINE.md (tile / triplet / jobcap / kNN /
LSH-dedup per round, plus composed per-config bests).

Usage: python BENCH/compose_r5_appendix.py [prefix]   (default r5bal2)

The efficiency divisor is read from each pair's own ``cpus`` fields —
never hardcoded — so a campaign saved with a non-default --lo/--hi
pair composes correctly or fails loudly (review r5)."""

import glob
import json
import os
import re
import sys

RAW = os.path.join(os.path.dirname(os.path.abspath(__file__)), "raw")

KEYS = [("tile_rows_per_sec", "tile"),
        ("triplet_rows_per_sec", "trip"),
        ("triplet_jobcap_rows_per_sec", "jobcap"),
        ("knn_rows_per_sec", "knn"),
        ("dedup_lsh10_rows_per_sec", "lsh10")]


def load(prefix, tag):
    out = {}
    for p in glob.glob(os.path.join(RAW, f"{prefix}_{tag}*.json")):
        m = re.search(rf"{tag}(\d+)", os.path.basename(p))
        if m is None:  # stray file matching the glob but not the
            continue   # <prefix>_<tag><round>.json naming — skip it
        out[int(m.group(1))] = json.load(open(p))
    return out


def main():
    prefix = sys.argv[1] if len(sys.argv) > 1 else "r5bal2"
    los, his = load(prefix, "lo"), load(prefix, "hi")
    rounds = sorted(set(los) & set(his))
    if not rounds:
        raise SystemExit(f"no paired {prefix}_lo*/hi* raws in {RAW}")
    cpus = {(los[r]["cpus"], his[r]["cpus"]) for r in rounds}
    if len(cpus) != 1:
        raise SystemExit(f"mixed cpu pairs across rounds: {cpus}")
    (lo_cpus, hi_cpus), = cpus
    if hi_cpus % lo_cpus:
        raise SystemExit(f"hi cpus {hi_cpus} not a multiple of lo "
                         f"cpus {lo_cpus}")
    ratio = hi_cpus // lo_cpus
    print(f"prefix {prefix}: local[{lo_cpus}] vs local[{hi_cpus}] "
          f"(ratio {ratio})\n")
    hdr = "| round |" + "".join(
        f" {t} lo | {t} hi | {t} eff |" for _, t in KEYS)
    sep = "|---|" + "---|" * (3 * len(KEYS))
    print(hdr)
    print(sep)
    best = {}
    for r in rounds:
        row = f"| {r} |"
        for k, t in KEYS:
            a, b = los[r].get(k), his[r].get(k)
            if a and b:
                row += f" {a:,.0f} | {b:,.0f} | {b / (ratio * a):.3f} |"
                best.setdefault(k, [0, 0])
                best[k][0] = max(best[k][0], a)
                best[k][1] = max(best[k][1], b)
            else:
                row += " n/a | n/a | n/a |"
        print(row)
    print()
    for k, t in KEYS:
        if k in best:
            a, b = best[k]
            print(f"composed {t}: lo {a:,.0f} hi {b:,.0f} "
                  f"eff {b / (ratio * a):.3f}")


if __name__ == "__main__":
    main()
