#!/usr/bin/env python3
"""Time the DuckDB oracle SQL per query (single-node reference bar)
and compare with a graft Bench JSON line. Usage:
    python3 scripts/bench_duck.py /tmp/verify_out/oracle_sql.json \
        /root/testdata/sf0.1 [bench.json] [out.json]
With out.json, also writes the per-query (duckdb, spark) pairs as a
committed artifact (BENCH_DUCK_r{N}.json).
(Driver-side tooling only — the Scala library never depends on this.)
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(oracle_path, sf_dir, bench_path=None, out_path=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(oracle_path))
    spark = {}
    if bench_path:
        b = json.load(open(bench_path))
        spark = b.get("queries", {})
    duck = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            duck[name] = time.time() - t0
        except Exception as e:
            duck[name] = -1.0
            print(f"{name}: duckdb error {e}", file=sys.stderr)
    total_d = sum(v for v in duck.values() if v > 0)
    print(f"{'query':22s} {'duckdb':>8s} {'spark':>8s} {'ratio':>7s}")
    for name in sorted(duck):
        d = duck[name]
        # Bench serializes failed queries as JSON null (older artifacts
        # used -1.0) — treat both as "no number".
        s = spark.get(name)
        ratio = f"{s / d:6.1f}x" if (s and d > 0) else "      -"
        print(f"{name:22s} {d:8.2f} {s if s else float('nan'):8.2f} {ratio}")
    if spark:
        total_s = sum(v for k, v in spark.items()
                      if k in duck and isinstance(v, (int, float)) and v > 0)
        print(f"{'TOTAL (oracle set)':22s} {total_d:8.2f} {total_s:8.2f} "
              f"{total_s / total_d:6.1f}x")
    if out_path:
        pairs = {
            name: {"duckdb": round(duck[name], 3),
                   "spark": (round(spark[name], 3)
                             if isinstance(spark.get(name), (int, float))
                             else None)}
            for name in sorted(duck)}
        artifact = {
            "note": ("paired same-session run: DuckDB times the IDENTICAL "
                     "oracle SQL the driver's correctness gate hashes "
                     "against; spark times are the Bench medians from the "
                     "same box"),
            "sf_dir": sf_dir,
            "n_queries": len(pairs),
            "total_duckdb_sec": round(total_d, 2),
            "total_spark_sec": (round(sum(
                v for k, v in spark.items()
                if k in duck and isinstance(v, (int, float)) and v > 0), 2)
                if spark else None),
            "queries": pairs,
        }
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main(*sys.argv[1:])
