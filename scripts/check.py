#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
    python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01
(Driver-side tooling only — the Scala library never depends on this.)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        ec = sorted(exp.columns)
        gc = sorted(got.columns)
        if ec != gc:
            print(f"FAIL {name}: columns differ\n  oracle: {ec}\n  spark:  {gc}")
            n_bad += 1
            continue
        exp = exp[ec]
        got = got[gc]
        if len(exp) != len(got):
            print(f"FAIL {name}: rows differ oracle={len(exp)} spark={len(got)}")
            n_bad += 1
            continue
        erows = sorted([tuple(norm(v) for v in r) for r in exp.itertuples(index=False)],
                       key=repr)
        grows = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)],
                       key=repr)
        bad = [(a, b) for a, b in zip(erows, grows) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(erows)} rows differ; first:")
            print(f"  oracle: {bad[0][0]}\n  spark:  {bad[0][1]}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(erows)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
