#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle and diff. Usage:
    python3 scripts/check.py /tmp/verify_out /root/testdata/sf0.01
The compare is dtype-strict and bit-exact, like the driver's hash: a
DuckDB HUGEINT sum arriving as float64 next to Spark's int64 FAILS here
even though the values are numerically equal (Python `99111.0 == 99111`
is true — that laxness masked 3 driver failures in round 1).
(Driver-side tooling only — the Scala library never depends on this.)
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def strict_diff(exp, got):
    """None if frames are dtype- and bit-identical up to row order,
    else a human-readable reason."""
    # column sets first: a column present on only one side used to
    # KeyError inside the error-reporting path below, mislabeling the
    # failure as a crash instead of a schema diff
    if set(exp.columns) != set(got.columns):
        return ("column sets differ: "
                f"oracle-only={sorted(set(exp.columns) - set(got.columns))} "
                f"spark-only={sorted(set(got.columns) - set(exp.columns))}")
    ed = {c: str(exp[c].dtype) for c in exp.columns}
    gd = {c: str(got[c].dtype) for c in got.columns}
    if ed != gd:
        bad = {c: (ed[c], gd[c]) for c in ed if ed[c] != gd[c]}
        return f"dtypes differ (oracle, spark): {bad}"
    cols = list(exp.columns)
    # driver-like: sorts the whole frame; unsortable cells (arrays) are
    # a real failure mode there too, so let the exception propagate up
    exp = exp.sort_values(cols, kind="mergesort").reset_index(drop=True)
    got = got.sort_values(cols, kind="mergesort").reset_index(drop=True)
    try:
        pd.testing.assert_frame_equal(exp, got, check_exact=True)
        return None
    except AssertionError as e:
        return str(e).split("\n")[0] + " (bit-exact compare)"


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
        try:
            reason = strict_diff(exp, got)
        except Exception as e:
            reason = f"unsortable output (driver would crash too): {e}"
        if reason:
            print(f"FAIL {name}: {reason}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(exp)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
