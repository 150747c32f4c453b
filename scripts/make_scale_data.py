#!/usr/bin/env python3
"""Synthesize a larger scaling dataset from a testdata SF directory.

Replicates every big table K times with per-replica offsets on the
integral entity keys (each replica is a self-contained key universe, so
join selectivity per replica matches the source), leaving the tiny
dimension tables (nation, region) unreplicated and the low-cardinality
FKs into them untouched. Each replica lands in its own parquet file
under <table>.parquet/ so scans actually split — the point of the
artifact is measuring low-core vs high-core scaling on scan-bound
queries, which single-row-group sf0.1 files cannot express.

Measurement tooling only: the driver contract (real testdata SFs,
BENCH_LOCAL.json baselines) is untouched; runs against this directory
are reported separately as the scaling artifact.

Usage: make_scale_data.py <src_sf_dir> <out_dir> <K>
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSET = 1_000_000_000

# entity-key columns offset per replica (present-or-skipped per table)
KEYS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["nation", "region"]


def main():
    src, out, k = sys.argv[1], sys.argv[2], int(sys.argv[3])
    if os.path.exists(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t in DIMS:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied (dimension)")
    for t, keys in KEYS.items():
        tab = pq.read_table(f"{src}/{t}.parquet")
        d = f"{out}/{t}.parquet"
        os.makedirs(d)
        present = [c for c in keys if c in tab.schema.names]
        for i in range(k):
            rep = tab
            if i > 0:
                for c in present:
                    idx = rep.schema.get_field_index(c)
                    col = pc.add(rep.column(c), i * OFFSET)
                    rep = rep.set_column(idx, rep.schema.field(c), col)
            pq.write_table(rep, f"{d}/part-{i:03d}.parquet")
        print(f"{t}: {k} replicas x {tab.num_rows} rows, keys {present}")


if __name__ == "__main__":
    main()
