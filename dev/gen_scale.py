#!/usr/bin/env python3
"""Scale-out generator: replicate an sf dir N x with shifted keys so the
bench can measure above sf0.1 (VERDICT r5 item 2: every 100 TB claim rested
on sf0.1). Key shifts keep all FK relationships intact *within* a replica;
replicas are disjoint (no cross-replica edges), so the workload is the
same shape at N x the rows. doc_id shifts are multiples of 10 to preserve
the %10 bench/train split; parquet schemas (incl. events' TIMESTAMP_NS)
are preserved by pyarrow round-tripping.

usage: gen_scale.py <src_sf_dir> <dst_dir> <replicas>
"""
import sys, os
import pyarrow as pa
import pyarrow.parquet as pq

src, dst, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
os.makedirs(dst, exist_ok=True)

# per-table key columns -> per-replica shift (larger than any sf0.1 max key)
SHIFTS = {
    "customer": {"c_custkey": 100_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 100_000},
    "orders": {"o_orderkey": 1_000_000, "o_custkey": 100_000},
    "lineitem": {"l_orderkey": 1_000_000, "l_partkey": 100_000, "l_suppkey": 100_000},
    "events": {"event_id": 1_000_000, "user_id": 100_000},
    "documents": {"doc_id": 100_000},
    "embeddings": {"vec_id": 100_000},
}
COPY = ["region", "nation"]

import pyarrow.compute as pc

for t in COPY:
    pq.write_table(pq.read_table(f"{src}/{t}.parquet"), f"{dst}/{t}.parquet")
    print(f"{t}: copied")

for t, shifts in SHIFTS.items():
    base = pq.read_table(f"{src}/{t}.parquet")
    reps = []
    for i in range(n):
        cols = []
        for name in base.column_names:
            col = base.column(name)
            if name in shifts and i > 0:
                col = pc.add(col, shifts[name] * i)
            cols.append(col)
        reps.append(pa.table(cols, names=base.column_names))
    out = pa.concat_tables(reps).combine_chunks()
    # cast back to the source schema (pc.add can widen); keeps ns timestamps
    out = out.cast(base.schema)
    pq.write_table(out, f"{dst}/{t}.parquet")
    print(f"{t}: {base.num_rows} -> {out.num_rows}")
