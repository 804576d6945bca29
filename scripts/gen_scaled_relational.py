#!/usr/bin/env python3
"""Key-shifted 10x relational fixture generator (VERDICT r6 #2).

Scales the TPC-H-shape tables (lineitem/orders/customer/part/supplier)
by replicating each row COPIES extra times with every join key shifted
by copy * SHIFT (> max base key), so:

- join fan-in/fan-out per key is UNCHANGED (each copy is a disjoint,
  internally consistent universe — a join never crosses copies);
- every value distribution (dates, flags, prices, segments) is
  preserved exactly, so filters select the same fraction;
- aggregates scale linearly and the per-key top-k shapes are stable.

That makes wall-time ratios interpretable: a healthy query should cost
~(COPIES+1)x of its base time or less (fixed overheads amortize);
anything super-linear is a plan that stopped fitting (broadcast that
should have flipped, partition that stopped fitting in memory).

nation/region (true enums) and the corpus tables (events/documents/
embeddings — scaled separately by gen_scaled_corpus.py) are copied
unchanged.

Usage: python3 scripts/gen_scaled_relational.py [src_sf_dir] [out_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/sf1_relational 9
"""
import shutil
import sys

import duckdb

SHIFT = 10_000_000  # > max key at sf0.1 (o_orderkey tops out ~6M at sf1)

SHIFTED = {
    "orders": {"o_orderkey": SHIFT, "o_custkey": SHIFT},
    "lineitem": {"l_orderkey": SHIFT, "l_partkey": SHIFT,
                 "l_suppkey": SHIFT},
    "customer": {"c_custkey": SHIFT},
    "part": {"p_partkey": SHIFT},
    "supplier": {"s_suppkey": SHIFT},
}
COPIED = ["nation", "region", "events", "documents", "embeddings"]


def main(src, out, copies):
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTED.items():
        cols = [r[0] for r in con.sql(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'").fetchall()]
        mx = con.sql("SELECT max(" + "), max(".join(keys) + ")"
                     f" FROM '{src}/{table}.parquet'").fetchone()
        assert all(m < SHIFT for m in mx), \
            f"{table}: max key {mx} >= SHIFT {SHIFT}"
        proj = ", ".join(
            f"{c} + c.copy * {keys[c]} AS {c}" if c in keys else c
            for c in cols)
        con.sql(f"""
            COPY (SELECT {proj}
                  FROM '{src}/{table}.parquet',
                       (SELECT unnest(range(0, {copies + 1})) AS copy) c)
            TO '{out}/{table}.parquet' (FORMAT PARQUET)""")
        n = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'"
                    ).fetchone()[0]
        print(f"{table}: {n} rows ({copies + 1}x)")
    for table in COPIED:
        shutil.copy(f"{src}/{table}.parquet", f"{out}/{table}.parquet")
        print(f"{table}: copied unchanged")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_relational"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    main(src, out, copies)
