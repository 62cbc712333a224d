#!/usr/bin/env python3
"""SURVEY.md §2 inventory checker: counts rows and asserts every row
key is unique (the checklist is the coverage contract — rows must be
uniquely addressable; r14 shipped three silent key collisions).
Exit 1 on any duplicate key.
"""
import collections
import sys

lines = open("SURVEY.md").read().splitlines()
keys = []
in2 = False
for i, l in enumerate(lines, 1):
    if l.startswith("## §2"):
        in2 = True
    elif l.startswith("## §3"):
        in2 = False
    if in2 and l.startswith("|"):
        cells = [c.strip() for c in l.strip("|").split("|")]
        if len(cells) >= 2 and cells[0] not in ("#",) and not set(cells[0]) <= set("-: "):
            keys.append((cells[0], i, cells[1][:50]))

dups = {k: c for k, c in collections.Counter(k for k, _, _ in keys).items() if c > 1}
print(f"SURVEY §2 inventory rows: {len(keys)}")
if dups:
    for k, i, name in keys:
        if k in dups:
            print(f"DUPLICATE KEY {k} at line {i}: {name}", file=sys.stderr)
    sys.exit(1)
print("all row keys unique")
