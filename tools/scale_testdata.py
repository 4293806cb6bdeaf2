#!/usr/bin/env python3
"""sf1 rehearsal generator: replicate sf0.1 R times (default 10) with
key-space shifts that preserve join consistency and mod-based selectivity,
so every bench query's per-row work is isomorphic to the base corpus and
scaling should be ~linear BY CONSTRUCTION:

- entity keys (cust/supp/part/doc/vec) stride 1e6 per replica; orderkeys
  and event_ids stride 1e7 (multiple of lcm(10, 25) = 50, preserving the
  events action/block/log derivations); user_id strides 7e6 (multiple of 7,
  preserving the trader % 7 endpoint selectivity);
- region/nation stay single-copy (dimensions don't scale with data);
- documents (r > 0): every token gets the replica id appended — the
  within-replica shingle/Jaccard structure is isomorphic to the base corpus
  and cross-replica shingle overlap is ZERO, so dedup workloads grow
  linearly instead of gaining 10x artificial near-dup clusters;
- embeddings (r > 0): dimensions cyclically rotated per replica — common
  permutation preserves within-replica geometry exactly, decorrelates
  replicas.

Timestamp columns are restored to their SOURCE parquet type via pyarrow
(DuckDB's arrow fetch normalizes to micros). The source mixes units —
events.ts is timestamp[ns] (read by the engine as BIGINT via nanosAsLong),
while o_orderdate/l_shipdate are timestamp[ms] (read as real timestamps) —
so a blanket ns cast is WRONG: it silently turned the ms date columns into
BIGINT at sf1 and broke all 8 date-based OLAP queries in round 5
(tools/bench_sf1_rehearsal.json round-5 `failed` list). Casting each column
back to the unit the source file declares keeps the engine's view of sf1
byte-compatible with sf0.1.

Usage: python3 tools/scale_testdata.py [src] [dst] [R]
"""
import os
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
R = int(sys.argv[3]) if len(sys.argv) > 3 else 10

E = 1_000_000       # entity-key stride
EV = 10_000_000     # orderkey / event_id stride (multiple of 50)
U = 7_000_000       # user_id stride (multiple of 7)

con = duckdb.connect()
os.makedirs(DST, exist_ok=True)


def write(table: str, selects):
    sql = " UNION ALL ".join(selects)
    tbl = con.execute(sql).fetch_arrow_table()
    # restore each timestamp column to the unit its SOURCE column declares
    # (ns stays ns for nanosAsLong, ms stays ms for real date columns)
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
    print(f"[scale] {table}: {tbl.num_rows} rows")


for t in ("region", "nation"):
    write(t, [f"SELECT * FROM '{SRC}/{t}.parquet'"])

write("customer", [
    f"SELECT c_custkey + {r * E} AS c_custkey, c_name, c_nationkey, "
    f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"
    for r in range(R)])

write("supplier", [
    f"SELECT s_suppkey + {r * E} AS s_suppkey, s_name, s_nationkey, "
    f"s_acctbal FROM '{SRC}/supplier.parquet'"
    for r in range(R)])

write("part", [
    f"SELECT p_partkey + {r * E} AS p_partkey, p_name, p_brand, p_type, "
    f"p_size, p_retailprice FROM '{SRC}/part.parquet'"
    for r in range(R)])

write("orders", [
    f"SELECT o_orderkey + {r * EV} AS o_orderkey, "
    f"o_custkey + {r * E} AS o_custkey, o_orderstatus, o_totalprice, "
    f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'"
    for r in range(R)])

write("lineitem", [
    f"SELECT l_orderkey + {r * EV} AS l_orderkey, "
    f"l_partkey + {r * E} AS l_partkey, l_suppkey + {r * E} AS l_suppkey, "
    f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    f"l_returnflag, l_linestatus, l_shipdate FROM '{SRC}/lineitem.parquet'"
    for r in range(R)])

write("events", [
    f"SELECT event_id + {r * EV} AS event_id, ts, "
    f"user_id + {r * U} AS user_id, event_type, value, props "
    f"FROM '{SRC}/events.parquet'"
    for r in range(R)])


def doc_select(r: int) -> str:
    if r == 0:
        return f"SELECT * FROM '{SRC}/documents.parquet'"
    salted = f"regexp_replace(text, '([a-z0-9]+)', '\\1{r}', 'g')"
    return (f"SELECT doc_id + {r * E} AS doc_id, {salted} AS text, lang, "
            f"source, CAST(length({salted}) AS BIGINT) AS n_chars "
            f"FROM '{SRC}/documents.parquet'")


write("documents", [doc_select(r) for r in range(R)])


def emb_select(r: int) -> str:
    if r == 0:
        return f"SELECT * FROM '{SRC}/embeddings.parquet'"
    k = (r * 7) % 64 or 1
    return (f"SELECT vec_id + {r * E} AS vec_id, "
            f"CAST(embedding[{k + 1}:] || embedding[:{k}] AS FLOAT[]) "
            f"AS embedding, label FROM '{SRC}/embeddings.parquet'")


write("embeddings", [emb_select(r) for r in range(R)])
print(f"[scale] done -> {DST}")
