#!/usr/bin/env python
"""Deduplicate a sweep CSV in place: keep ONE row per
(shape, variant, num_points, radius) — the LAST ok row if any, else the
last row (so retried configs replace their crash-and-continue error
rows, and the artifact never contradicts itself; VERDICT r4 ask #7).

Usage: python scripts/dedupe_sweep_csv.py <csv> [<csv> ...]
"""

import csv
import sys


def dedupe(path: str) -> None:
    with open(path) as f:
        reader = csv.DictReader(f)
        fields = reader.fieldnames
        rows = list(reader)
    best: dict = {}
    order: list = []
    for r in rows:
        key = (r["shape"], r["variant"], r["num_points"], r["radius"])
        if key not in best:
            order.append(key)
            best[key] = r
        else:
            # replace unless it would downgrade an ok row to an error
            if r["status"] == "ok" or best[key]["status"] != "ok":
                best[key] = r
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(best[k] for k in order)
    n_ok = sum(1 for k in order if best[k]["status"] == "ok")
    print(f"{path}: {len(rows)} rows -> {len(order)} configs, {n_ok} ok")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        dedupe(p)
