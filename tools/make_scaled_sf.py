"""Synthesize a larger scale factor from an existing testdata dir for
SCALING runs (perf evidence only — correctness gates always run on the
driver's own parquet).

Replicates every table N× with CONSISTENT key shifts so referential
integrity survives (each replica's orders point at that replica's
customers, lineitems at that replica's orders/parts/suppliers).
Dimension tables (region, nation) don't scale, matching TPC-H's own
scaling rules.  Two tables get per-replica perturbation so workload
characteristics are preserved rather than degenerate:

* documents.text — every 3rd word is prefixed with a replica marker,
  so replicas are NOT near-duplicates of each other (plain copies
  would hand the dedup family 10-way duplicate groups and blow the
  pair count quadratically — unrepresentative of a real corpus).
* embeddings.embedding — deterministic per-(vec_id, dim, replica)
  jitter (±0.1), so cosine structure stays diverse instead of every
  vector having 9 exact twins (which would degenerate ANN/SemDeDup).

Usage:
    python tools/make_scaled_sf.py --src /root/testdata/sf0.1 \
        --out /tmp/sfgen_1 --factor 10
"""

from __future__ import annotations

import argparse
import os

import duckdb


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfgen_1")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    n = args.factor

    def src(t):
        return f"read_parquet('{args.src}/{t}.parquet')"

    def key_span(t, col):
        return con.execute(
            f"SELECT MAX({col}) + 1 FROM {src(t)}"
        ).fetchone()[0]

    def copy(t, sql):
        con.execute(
            f"COPY ({sql}) TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        rows = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {rows} rows")

    # dimensions: unscaled
    for t in ("region", "nation"):
        copy(t, f"SELECT * FROM {src(t)}")

    spans = {
        "customer": key_span("customer", "c_custkey"),
        "supplier": key_span("supplier", "s_suppkey"),
        "part": key_span("part", "p_partkey"),
        "orders": key_span("orders", "o_orderkey"),
        "documents": key_span("documents", "doc_id"),
        "embeddings": key_span("embeddings", "vec_id"),
        "events": key_span("events", "event_id"),
        "users": key_span("events", "user_id"),
    }
    rng = f"CROSS JOIN range({n}) rep(r)"

    copy(
        "customer",
        f"SELECT c_custkey + r * {spans['customer']} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment FROM {src('customer')} {rng}",
    )
    copy(
        "supplier",
        f"SELECT s_suppkey + r * {spans['supplier']} AS s_suppkey, s_name, "
        f"s_nationkey, s_acctbal FROM {src('supplier')} {rng}",
    )
    copy(
        "part",
        f"SELECT p_partkey + r * {spans['part']} AS p_partkey, p_name, "
        f"p_brand, p_type, p_size, p_retailprice FROM {src('part')} {rng}",
    )
    copy(
        "orders",
        f"SELECT o_orderkey + r * {spans['orders']} AS o_orderkey, "
        f"o_custkey + r * {spans['customer']} AS o_custkey, o_orderstatus, "
        f"o_totalprice, o_orderdate, o_orderpriority FROM {src('orders')} {rng}",
    )
    copy(
        "lineitem",
        f"SELECT l_orderkey + r * {spans['orders']} AS l_orderkey, "
        f"l_partkey + r * {spans['part']} AS l_partkey, "
        f"l_suppkey + r * {spans['supplier']} AS l_suppkey, "
        f"l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
        f"l_returnflag, l_linestatus, l_shipdate FROM {src('lineitem')} {rng}",
    )
    copy(
        "events",
        f"SELECT event_id + r * {spans['events']} AS event_id, ts, "
        f"user_id + r * {spans['users']} AS user_id, event_type, value, "
        f"props FROM {src('events')} {rng}",
    )
    copy(
        "documents",
        f"""
        SELECT doc_id + r * {spans['documents']} AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                            (w, i) -> CASE WHEN i % 3 = 1
                                      THEN 'q' || r::VARCHAR || w
                                      ELSE w END), ' ')
               END AS text,
               lang, source,
               CAST(strlen(CASE WHEN r = 0 THEN text
                    ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                            (w, i) -> CASE WHEN i % 3 = 1
                                      THEN 'q' || r::VARCHAR || w
                                      ELSE w END), ' ')
               END) AS BIGINT) AS n_chars
        FROM {src('documents')} {rng}
        """,
    )
    copy(
        "embeddings",
        f"""
        SELECT vec_id + r * {spans['embeddings']} AS vec_id,
               CASE WHEN r = 0 THEN embedding
                    ELSE list_transform(embedding, (x, i) ->
                        CAST(x + (CAST(hash(vec_id * 64 + i + r * 131071)
                                       % 1001 AS BIGINT) - 500) / 5000.0
                             AS FLOAT))
               END AS embedding,
               label
        FROM {src('embeddings')} {rng}
        """,
    )
    print("done:", args.out)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
