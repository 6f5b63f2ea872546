#!/usr/bin/env python
"""Print the round-5 campaign per-round disclosure table from
BENCH/raw/r5bal_{lo,hi}N.json — markdown rows for the hand-written
appendix of BENCH/BASELINE.md (tile / triplet / jobcap / kNN /
LSH-dedup per round, plus composed per-config bests)."""

import glob
import json
import os
import re

RAW = os.path.join(os.path.dirname(os.path.abspath(__file__)), "raw")

KEYS = [("tile_rows_per_sec", "tile"),
        ("triplet_rows_per_sec", "trip"),
        ("triplet_jobcap_rows_per_sec", "jobcap"),
        ("knn_rows_per_sec", "knn"),
        ("dedup_lsh10_rows_per_sec", "lsh10")]


def load(tag):
    out = {}
    for p in glob.glob(os.path.join(RAW, f"r5bal2_{tag}*.json")):
        i = int(re.search(rf"{tag}(\d+)", os.path.basename(p)).group(1))
        out[i] = json.load(open(p))
    return out


def main():
    los, his = load("lo"), load("hi")
    rounds = sorted(set(los) & set(his))
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
                row += f" {a:,.0f} | {b:,.0f} | {b / (4 * a):.3f} |"
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
                  f"eff {b / (4 * a):.3f}")


if __name__ == "__main__":
    main()
