#!/usr/bin/env python3
"""Combine one or more full-suite Bench JSON runs into blessing
evidence: per-query min across runs, per-run ambient (suite-median
ratio vs the current BASELINE.md mins over queries both know), and the
regenerated per-query markdown table.

Usage: python3 dev/bless.py RUN.json [RUN2.json ...]

Prints the evidence summary and writes /tmp/bless_table.md (the
`## Per-query seconds` table body) plus /tmp/bless_mins.json (the
per-query blessed numbers with their source run and that run's
ambient). Blessing stays a human act: BASELINE.md is never edited by
this script.
"""
import json
import re
import statistics
import sys


def baseline_mins(path="BASELINE.md"):
    base = {}
    for line in open(path):
        m = re.match(r"\| `(\w+)` \| ([\d.]+) \|", line)
        if m:
            base[m.group(1)] = float(m.group(2))
    return base


def main():
    runs = []
    for p in sys.argv[1:]:
        d = json.load(open(p))
        runs.append((p, d))
    base = baseline_mins()

    # ambient per run: suite-median ratio vs blessed mins (shared keys)
    ambients = {}
    for p, d in runs:
        rs = [t / base[q] for q, t in d["queries"].items()
              if q in base and t > 0]
        ambients[p] = statistics.median(rs) if rs else float("nan")
        print(f"{p}: {len(d['queries'])} queries, failed={d['failed']}, "
              f"ambient(median ratio vs blessed)={ambients[p]:.2f}")

    # per-query min across runs, tracking which run won
    mins = {}
    for p, d in runs:
        for q, t in d["queries"].items():
            if t < 0:
                continue
            if q not in mins or t < mins[q]["sec"]:
                mins[q] = {"sec": t, "run": p, "run_ambient": ambients[p]}

    total = sum(v["sec"] for v in mins.values())
    first = sorted(mins)[0]
    print(f"\nblessed totals: {total:.1f} s over {len(mins)} queries "
          f"(excl first measured [{first}]: {total - mins[first]['sec']:.1f} s)")

    new = sorted(q for q in mins if q not in base)
    up = sorted((q, mins[q]["sec"], base[q]) for q in base
                if q in mins and mins[q]["sec"] < 0.8 * base[q])
    print(f"new queries ({len(new)}): " +
          ", ".join(f"{q}={mins[q]['sec']:.2f}" for q in new))
    print(f"improved >20% ({len(up)}):")
    for q, t, b in up:
        print(f"  {q:28s} {b:5.2f} -> {t:5.2f}")
    worse = sorted((q, mins[q]["sec"], base[q]) for q in base
                   if q in mins and mins[q]["sec"] > 1.5 * base[q])
    print(f"still >1.5x blessed even at min-of-runs ({len(worse)}):")
    for q, t, b in worse:
        print(f"  {q:28s} {b:5.2f} -> {t:5.2f}")

    with open("/tmp/bless_table.md", "w") as f:
        for q in sorted(mins):
            f.write(f"| `{q}` | {mins[q]['sec']:.2f} |\n")
    json.dump(mins, open("/tmp/bless_mins.json", "w"), indent=1)
    print("\nwrote /tmp/bless_table.md and /tmp/bless_mins.json")


if __name__ == "__main__":
    main()
