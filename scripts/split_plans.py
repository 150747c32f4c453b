#!/usr/bin/env python3
"""Split a graft.Plans dump (== qname headers) into per-query files.

Usage: split_plans.py <dump.txt> <outdir> <suffix> [q1 q2 ...]
Writes <outdir>/<query>_<suffix>.txt for each named query (or all).
"""
import os
import re
import sys


def main():
    dump, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4:])
    os.makedirs(outdir, exist_ok=True)
    text = open(dump).read()
    parts = re.split(r"\n?={72}\n== (\S+)\n={72}\n", text)
    # parts: [preamble, name1, body1, name2, body2, ...]
    n = 0
    for i in range(1, len(parts) - 1, 2):
        name, body = parts[i], parts[i + 1]
        if only and name not in only:
            continue
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(body.strip() + "\n")
        n += 1
    print(f"wrote {n} files to {outdir}")


if __name__ == "__main__":
    main()
