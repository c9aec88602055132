"""sf1.0 scale-probe fixture: deterministic 10× replication of the
driver's sf0.1 tables with shifted keys.

The 2×-of-baseline contract has only ever been measured at sf0.1; this
fixture gives a 10× point (6M-row lineitem — TPC-H sf1 shape) so the
linear-scaling story the plan audit promises can be MEASURED locally
(VERDICT r3 #2). DuckDB's dbgen extension needs network access, which
this container lacks, so the fixture replicates the existing tables
instead: replica k shifts every key column by k × (max_key + 1), which
preserves join fan-outs, key-group sizes, and value distributions while
scaling row counts 10×. region/nation stay fixed (they are fixed-size in
TPC-H). Strings are reused verbatim — fine for a throughput probe; the
correctness gate never runs at this sf.

Usage: python tools/gen_sf1.py [out_dir]   (default fixtures/sf1/)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10

#: key columns shifted per replica: table -> [(col, stride_source_col)]
SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY_AS_IS = ["region", "nation"]

#: strides come from the FOREIGN table's own key space so references stay
#: aligned: orders.o_custkey must shift by customer's stride, etc.
STRIDE_KEY = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def main(out_dir: str | None = None) -> None:
    if out_dir is None:
        out_dir = (
            sys.argv[1]
            if len(sys.argv) > 1
            else os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "fixtures",
                "sf1",
            )
        )
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    strides: dict[str, int] = {}
    for col, (tbl, key) in STRIDE_KEY.items():
        if col not in strides:
            strides[col] = (
                con.execute(
                    f"SELECT MAX({key}) + 1 FROM '{SRC}/{tbl}.parquet'"
                ).fetchone()[0]
            )
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{out_dir}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t, cols in SHIFTS.items():
        all_cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + rep * {strides[c]} AS {c}" if c in cols else c
            for c in all_cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"range({REPS}) r(rep)) TO '{out_dir}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT COUNT(*) FROM '{out_dir}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"wrote {out_dir}")


if __name__ == "__main__":
    main()
