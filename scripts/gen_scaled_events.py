#!/usr/bin/env python3
"""Key-shifted 10x events fixture generator (round 7).

Neither scaled fixture touched events: gen_scaled_relational.py and
gen_scaled_corpus.py both copy it unchanged, so the events family
(sessionization, CEP, experimentation, time-series, Markov, AUC) had
no scale measurements. This generator replicates events with
event_id/user_id shifted per copy and TIMESTAMPS UNCHANGED — the
correct scaling for behavioral data: 10x the users on the same
calendar, so daily frames keep their day count while per-day density
grows 10x (calendar-bounded operators must stay flat; per-user keyed
shuffles must scale linearly).

The ts column must keep its TIMESTAMP(NANOS) physical parquet type
(graft.Tables.load reads it through nanosAsLong), so the copy is done
in pyarrow, which preserves timestamp[ns] — DuckDB COPY would rewrite
it as microseconds and break the loader.

All other tables are copied unchanged.

Usage: python3 scripts/gen_scaled_events.py [src_sf_dir] [out_dir] [copies]
Defaults: /root/testdata/sf0.1 /tmp/sf1_events 9
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SHIFT = 10_000_000


def main(src, out, copies):
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(f"{src}/events.parquet")
    assert pa.types.is_timestamp(t.schema.field("ts").type), t.schema
    mx = max(pc.max(t["event_id"]).as_py(), pc.max(t["user_id"]).as_py())
    assert mx < SHIFT, f"max id {mx} >= SHIFT {SHIFT}"
    parts = [t]
    for c in range(1, copies + 1):
        parts.append(t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pc.add(t["event_id"], c * SHIFT)).set_column(
            t.schema.get_field_index("user_id"), "user_id",
            pc.add(t["user_id"], c * SHIFT)))
    big = pa.concat_tables(parts)
    pq.write_table(big, f"{out}/events.parquet")
    print(f"events: {big.num_rows} rows ({copies + 1}x), "
          f"ts type {t.schema.field('ts').type} preserved")
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "documents", "embeddings"]:
        shutil.copy(f"{src}/{name}.parquet", f"{out}/{name}.parquet")
    print("other tables copied unchanged")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_events"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 9
    main(src, out, copies)
