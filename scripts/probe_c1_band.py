#!/usr/bin/env python3
"""DuckDB half + orchestrator of the interleaved C1-band probe
(VERDICT_r16 #4). Starts `graft.ProbeC1Band` (the Spark half) as a
subprocess and alternates arms strictly — S1,D1,S2,D2,… — via the
/tmp/c1_turn file handshake, so both engines measure inside the SAME
quiet box window (sequential arm blocks drift with the box and have
produced false conclusions twice; see graft-box-noise).

Usage:
    python3 scripts/probe_c1_band.py [oracle_sql.json] [sf_dir]
Defaults: /tmp/verify_out/oracle_sql.json, /root/testdata/sf0.1.
Prints the per-arm medians and ratios table for SURVEY §32.
"""
import json
import statistics
import subprocess
import sys
import time

import duckdb

QUERIES = ["q_token_count", "q_contamination", "q_contamination_by"]
TURN = "/tmp/c1_turn"
SPARK_OUT = "/tmp/c1_spark.jsonl"


def set_turn(t):
    with open(TURN, "w") as f:
        f.write(t)


def wait_for(t, proc):
    while True:
        try:
            if open(TURN).read().strip() == t:
                return
        except FileNotFoundError:
            pass
        if proc.poll() is not None:
            print("[probe] spark side exited early", file=sys.stderr)
            sys.exit(1)
        time.sleep(0.2)


def main():
    oracle_path = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/verify_out/oracle_sql.json"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    # warm the duck side the way the Spark side warms (buffer cache,
    # codegen): one throwaway control run
    con.execute(oracle["q_token_count"]).fetchall()
    set_turn("spark-0")  # not a real turn; spark waits for spark-1
    proc = subprocess.Popen(
        ["sbt", "-batch", "Test/runMain graft.ProbeC1Band"],
        env=dict(__import__("os").environ, SPARK_GRAFT_SF_DIR=sf_dir),
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    duck = {q: [] for q in QUERIES}
    try:
        for rep in range(1, 6):
            set_turn(f"spark-{rep}")
            wait_for(f"duck-{rep}", proc)
            for q in QUERIES:
                t0 = time.time()
                con.execute(oracle[q]).fetchall()
                sec = time.time() - t0
                duck[q].append(sec)
                print(f"[probe] rep {rep} duck {q:20s} {sec:6.2f} s",
                      flush=True)
    finally:
        proc.wait()
    spark = {q: [] for q in QUERIES}
    for line in open(SPARK_OUT):
        r = json.loads(line)
        spark[r["query"]].append(r["sec"])
    print(f"\n[probe] {'query':22s} {'spark_med':>9s} {'duck_med':>9s} "
          f"{'ratio':>7s}   spark reps / duck reps")
    for q in QUERIES:
        sm = statistics.median(spark[q])
        dm = statistics.median(duck[q])
        print(f"[probe] {q:22s} {sm:9.2f} {dm:9.2f} {sm / dm:6.1f}x   "
              f"{[round(x, 2) for x in spark[q]]} / "
              f"{[round(x, 2) for x in duck[q]]}")


if __name__ == "__main__":
    main()
