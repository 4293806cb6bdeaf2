#!/usr/bin/env python3
"""Skewed-data rehearsal generator (round-9 verdict item 7): derive a
variant of an sf dir with the two skew shapes a real corpus develops, so
the engine's skew posture is MEASURED on the actual operators rather than
only on the Skew.saltedSum demo:

- events: one HOT POOL — ~90% of events remapped to event_type 'click'
  (pool := event_type in the wire fixture). The wire fold key
  (pool, order_id, trader) stays fine-grained by construction (that IS the
  fold's skew armor — order ids are unique), but every per-pool stage
  (the fixture's governing-Create window, the book's per-pool rank
  windows) now sees one partition carrying 90% of the data.
  user_id % 10 != 0 keeps all five pools alive (the catalog queries need
  them) and keeps the remap deterministic.

- documents: one HOT NEAR-DUP CLUSTER — every doc_id % 250 == 0 becomes a
  near-copy of one base document (shared prefix, tiny per-doc suffix), a
  ~200-member near-dup family at sf1 whose shared-shingle LSH bucket
  dwarfs the organic 2-5-member buckets: the band self-join's per-bucket
  quadratic term and the component engine's hot star both concentrate in
  one key.

Other tables copy through unchanged (byte-identical scan profile), so a
skew-vs-uniform time ratio isolates the skewed operator, not the data
volume. Timestamp columns are restored to source units exactly like
scale_testdata.py (see its docstring for why a blanket cast is wrong).

Usage: python3 tools/skew_testdata.py [src] [dst]
"""
import os
import shutil
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1_skew"

con = duckdb.connect()
os.makedirs(DST, exist_ok=True)


def write(table: str, sql: str):
    tbl = con.execute(sql).fetch_arrow_table()
    src_schema = pq.read_schema(f"{SRC}/{table}.parquet")
    src_types = {f.name: f.type for f in src_schema}
    fields = [
        pa.field(f.name, src_types[f.name])
        if pa.types.is_timestamp(f.type) and f.name in src_types
        and pa.types.is_timestamp(src_types[f.name]) else f
        for f in tbl.schema
    ]
    tbl = tbl.cast(pa.schema(fields))
    pq.write_table(tbl, f"{DST}/{table}.parquet", version="2.6",
                   coerce_timestamps=None)
    print(f"[skew] {table}: {tbl.num_rows} rows")


# hot pool: ~90% of events land in 'click'; the other four pools survive
write("events",
      f"SELECT event_id, ts, user_id, "
      f"CASE WHEN user_id % 10 != 0 THEN 'click' ELSE event_type END "
      f"AS event_type, value, props FROM '{SRC}/events.parquet'")

# hot near-dup cluster: doc_id % 250 == 0 becomes a near-copy of doc 42
write("documents",
      f"WITH base AS (SELECT text AS btext FROM '{SRC}/documents.parquet' "
      f"WHERE doc_id = 42) "
      f"SELECT d.doc_id, "
      f"CASE WHEN d.doc_id % 250 = 0 THEN b.btext || ' hotdup' || "
      f"CAST(d.doc_id // 250 AS VARCHAR) ELSE d.text END AS text, "
      f"d.lang, d.source, "
      f"CAST(length(CASE WHEN d.doc_id % 250 = 0 THEN b.btext || ' hotdup' "
      f"|| CAST(d.doc_id // 250 AS VARCHAR) ELSE d.text END) AS BIGINT) "
      f"AS n_chars "
      f"FROM '{SRC}/documents.parquet' d CROSS JOIN base b")

for t in ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "embeddings"):
    shutil.copyfile(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    print(f"[skew] {t}: copied")

print(f"[skew] done -> {DST}")
