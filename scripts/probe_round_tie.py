#!/usr/bin/env python3
"""DuckDB side of the round(double,k) half-tie kernel probe.

Reads /tmp/round_tie_spark.csv (written by `Test/runMain
graft.ProbeRoundTie`: k, value class, exact rendering, Spark's round),
replays the identical doubles through real DuckDB `round(x, k)`, and
prints the firing table: per scale and per value class, how many
synthesized boundary values the two engines round DIFFERENTLY.

Also adjudicates which pure kernel DuckDB's round actually is
(multiply -> half-away vs multiply -> half-even) by diffing both
candidates against the engine on the same values — so future site
conversions can reason from a validated closed form instead of a
guess.

Third arm: validates the VARCHAR MIRROR — `round(CAST(CAST(x AS
VARCHAR) AS DECIMAL(38,18)), k)` — against Spark's kernel. DuckDB
renders doubles with shortest-roundtrip digits (the same unique digit
sequence java.math.BigDecimal.valueOf sees), so rounding that decimal
HALF_UP IS Spark's round. This is the form `Shared.roundSql` emits so
oracle twins mirror Spark's round exactly instead of DuckDB's
multiply-half-away kernel; this probe is its evidence (expected: 0
mismatches on the full boundary population, both signs).
"""
import csv
import math
import sys

import duckdb


def duck_half_away(x: float, k: int) -> float:
    p = 10.0 ** k
    y = x * p
    f = math.floor(y)
    if y - f >= 0.5:
        f += 1.0
    return f / p


def duck_half_even(x: float, k: int) -> float:
    p = 10.0 ** k
    # Python round() on float is IEEE round-half-even of the product
    return round(x * p) / p


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/round_tie_spark.csv"
    rows = list(csv.DictReader(open(path)))
    con = duckdb.connect()
    # one batched query per scale: CSV renderings round-trip bit-exact
    by_k = {}
    for r in rows:
        by_k.setdefault(int(r["k"]), []).append(r)
    fired = []
    kernel_match = {"half_away": 0, "half_even": 0, "total": 0}
    mirror_mismatch = 0
    for k, rs in sorted(by_k.items()):
        vals = [r["x"] for r in rs]
        con.execute("CREATE OR REPLACE TABLE t AS SELECT * FROM (VALUES "
                    + ",".join(f"(CAST('{v}' AS DOUBLE))" for v in vals)
                    + ") v(x)")
        duck = [row[0] for row in
                con.execute(f"SELECT round(x, {k}) FROM t").fetchall()]
        mirror = [row[0] for row in con.execute(
            f"SELECT CAST(round(CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)),"
            f" {k}) AS DOUBLE) FROM t").fetchall()]
        for r, d, m in zip(rs, duck, mirror):
            x = float(r["x"])
            spark = float(r["spark_round"])
            kernel_match["total"] += 1
            if d == duck_half_away(x, k):
                kernel_match["half_away"] += 1
            if d == duck_half_even(x, k):
                kernel_match["half_even"] += 1
            if d != spark:
                fired.append((k, r["cls"], r["x"], spark, d))
            if m != spark:
                mirror_mismatch += 1
                if mirror_mismatch <= 5:
                    print(f"[probe] MIRROR MISMATCH k={k} x={r['x']} "
                          f"spark={spark} mirror={m}")
    n = len(rows)
    print(f"[probe] {n} synthesized boundary values, {len(fired)} FIRE "
          f"(Spark round != DuckDB round on identical bits)")
    print(f"[probe] duckdb kernel adjudication: multiply->half_away matches "
          f"{kernel_match['half_away']}/{kernel_match['total']}, "
          f"multiply->half_even matches "
          f"{kernel_match['half_even']}/{kernel_match['total']}")
    print(f"[probe] VARCHAR mirror (Shared.roundSql form) vs Spark kernel: "
          f"{mirror_mismatch}/{kernel_match['total']} mismatches")
    agg = {}
    for k, cls, _, _, _ in fired:
        agg[(k, cls)] = agg.get((k, cls), 0) + 1
    tot = {}
    for r in rows:
        key = (int(r["k"]), r["cls"])
        tot[key] = tot.get(key, 0) + 1
    for key in sorted(tot):
        f = agg.get(key, 0)
        print(f"[probe] k={key[0]} cls={key[1]}: {f}/{tot[key]} fire "
              f"({100.0 * f / tot[key]:.2f}%)")
    for k, cls, x, s, d in fired[:12]:
        print(f"[probe]   example k={k} {cls}: x={x} spark={s} duck={d}")


if __name__ == "__main__":
    main()
