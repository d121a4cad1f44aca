#!/usr/bin/env python3
"""Join two Bench artifacts (e.g. BENCH_SELF.json at sf0.1 and
BENCH_SELF_sf1.json at sf1) into a per-query scaling table, flagging
queries whose wall-time ratio exceeds a threshold (default 15x for 10x
data, the r6 VERDICT linearity criterion).

Usage: python3 tools/scaling_table.py BENCH_SELF.json BENCH_SELF_sf1.json [threshold]
"""
import json
import sys


def load(path):
    with open(path) as fh:
        return json.load(fh)


def main():
    a, b = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    qa, qb = a["queries"], b["queries"]
    common = sorted(set(qa) & set(qb))
    flagged = []
    print(f"| query | {a['sf'].split('/')[-1]} s | {b['sf'].split('/')[-1]} s | ratio |")
    print("| --- | --- | --- | --- |")
    rows = []
    for q in common:
        r = qb[q] / qa[q] if qa[q] > 0 else float("inf")
        rows.append((r, q))
    for r, q in sorted(rows, reverse=True):
        mark = " **> threshold**" if r > thresh else ""
        print(f"| {q} | {qa[q]:.2f} | {qb[q]:.2f} | {r:.1f}x{mark} |")
        if r > thresh:
            flagged.append(q)
    ta, tb = sum(qa[q] for q in common), sum(qb[q] for q in common)
    print(f"\ntotal over {len(common)} common queries: {ta:.1f} s -> {tb:.1f} s "
          f"({tb / ta:.1f}x); flagged (> {thresh}x): {flagged or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
