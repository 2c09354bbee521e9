#!/usr/bin/env python3
"""Regenerate the per-query table + totals for BENCH_BASELINE.md.

Usage: python3 tools/baseline_table.py <duck.json> <bench_round.json>
Prints the markdown table body and the totals block to stdout; the
narrative sections of BENCH_BASELINE.md are maintained by hand.
"""
import sys, json

duck = json.load(open(sys.argv[1]))
graft = json.load(open(sys.argv[2]))["queries"]

names = sorted(set(duck) | set(graft))
both_d = both_g = 0.0
n_both = 0
timeouts = []
rows = []
for n in names:
    d = duck.get(n)
    g = graft.get(n)
    gcell = f"{g:.3f}" if g is not None else "—"
    if d == "timeout":
        rows.append(f"| {n} | > 90 (timeout) | {gcell} | — |")
        timeouts.append(n)
    elif d is None:
        rows.append(f"| {n} | — (designed no-oracle) | {gcell} | — |")
    elif g is None:
        rows.append(f"| {n} | {d:.3f} | — | — |")
    else:
        ratio = d / g if g else float("inf")
        rows.append(f"| {n} | {d:.3f} | {gcell} | {ratio:.2f}x |")
        both_d += d
        both_g += g
        n_both += 1

print("\n".join(rows))
print()
print(f"both-complete: {n_both} queries duck {both_d:.1f} s graft {both_g:.1f} s "
      f"graft/duck {both_g/both_d:.2f}x")
for n in timeouts:
    if n in graft:
        print(f"timeout: {n} graft {graft[n]:.2f} s")
no_oracle = [n for n in names if n not in duck]
for n in no_oracle:
    if n in graft:
        print(f"no-oracle: {n} graft {graft[n]:.2f} s")
q77d = duck.get("q77_fuzzy_dedup")
q77g = graft.get("q77_fuzzy_dedup")
if isinstance(q77d, float) and q77g is not None:
    print(f"excl q77: graft/duck {(both_g - q77g)/(both_d - q77d):.2f}x")
print(f"all {len(graft)} graft total {sum(graft.values()):.1f} s")
