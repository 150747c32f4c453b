#!/usr/bin/env python3
"""Refresh / audit the bundled Public Suffix List snapshot.

The library ships a point-in-time copy of publicsuffix.org's list
(src/main/resources/graft/public_suffix_list.dat — public data, MPL
2.0). A deployment refreshes it with this script; no code changes are
needed because both the Spark side (graft.operators.Psl) and the DuckDB
oracle derive their rule tables and structural bounds (label depths,
exception arms) from the parsed file.

Usage:
    python3 scripts/psl_refresh.py            # audit the bundled copy
    python3 scripts/psl_refresh.py --fetch    # download + diff + replace

--fetch downloads https://publicsuffix.org/list/public_suffix_list.dat
(the only supported source per the list's own header). In an offline
environment the download fails gracefully and the bundled copy is left
untouched.

(Driver-side tooling only — the Scala library never depends on this.)
"""
import argparse
import sys
import urllib.request
from pathlib import Path

PSL_URL = "https://publicsuffix.org/list/public_suffix_list.dat"
BUNDLED = (Path(__file__).resolve().parent.parent
           / "src/main/resources/graft/public_suffix_list.dat")


def parse_counts(text):
    """Mirror of graft.operators.Psl.parse bucketing (1-label exact
    rules fold into the default rule on the Scala side, so they are
    counted separately here)."""
    rules = [ln.strip() for ln in text.splitlines()]
    rules = [ln for ln in rules if ln and not ln.startswith("//")]

    def labels(s):
        return s.count(".") + 1

    exact = [r for r in rules
             if not r.startswith("!") and not r.startswith("*.")
             and labels(r) >= 2]
    wild = [r[2:] for r in rules if r.startswith("*.")]
    exc = [r[1:] for r in rules if r.startswith("!")]
    one = [r for r in rules
           if not r.startswith("!") and not r.startswith("*.")
           and labels(r) == 1]
    max_rule_labels = max(
        [labels(r) for r in exact] + [labels(b) + 1 for b in wild]
        + [labels(e) for e in exc] + [1])
    return {
        "total_rules": len(rules),
        "exact_2plus": len(exact),
        "wildcard": len(wild),
        "exception": len(exc),
        "exact_1label_folded": len(one),
        "max_rule_labels": max_rule_labels,
    }


def report(title, counts):
    print(f"{title}:")
    for k, v in counts.items():
        print(f"  {k:>22} = {v}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fetch", action="store_true",
                    help="download the current list, diff, and replace")
    args = ap.parse_args()

    bundled = parse_counts(BUNDLED.read_text(encoding="utf-8"))
    report(f"bundled ({BUNDLED})", bundled)

    if not args.fetch:
        return 0

    try:
        with urllib.request.urlopen(PSL_URL, timeout=30) as r:
            fresh_text = r.read().decode("utf-8")
    except Exception as e:  # offline container, DNS failure, ...
        print(f"\nfetch failed ({e}) — bundled copy left untouched",
              file=sys.stderr)
        return 1

    fresh = parse_counts(fresh_text)
    report(f"fetched ({PSL_URL})", fresh)
    print("\ndiff (fetched - bundled):")
    for k in bundled:
        print(f"  {k:>22} = {fresh[k] - bundled[k]:+d}")
    if fresh["max_rule_labels"] != bundled["max_rule_labels"]:
        print("  NOTE: max_rule_labels changed — the Spark chain and the "
              "oracle arms regenerate from the parsed file automatically; "
              "re-run the correctness gate to confirm.")
    BUNDLED.write_text(fresh_text, encoding="utf-8")
    print(f"\nwrote {BUNDLED}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
