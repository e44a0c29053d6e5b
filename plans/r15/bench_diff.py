#!/usr/bin/env python3
"""Compare two bench JSON records: per-query ratio, sorted by delta."""
import json
import sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
qa, qb = a["queries"], b["queries"]
shared = sorted(set(qa) & set(qb), key=lambda k: qb[k] - qa[k])
print(f"{'query':44s} {'A':>7s} {'B':>7s} {'B-A':>7s} {'B/A':>6s}")
for k in shared:
    ra = qa[k]
    rb = qb[k]
    print(f"{k:44s} {ra:7.2f} {rb:7.2f} {rb-ra:+7.2f} {rb/ra:6.2f}")
ta = sum(qa[k] for k in shared)
tb = sum(qb[k] for k in shared)
print(f"\nshared {len(shared)}: A={ta:.1f}s B={tb:.1f}s ratio={tb/ta:.3f}")
print(f"A-only: {sorted(set(qa)-set(qb))}")
print(f"B-only: {sorted(set(qb)-set(qa))}")
