#!/usr/bin/env python3
"""Build the 10x scale-step dataset (dev-side tool, like compare_oracle.py).

Writes /tmp/graft_sf1/{documents,embeddings}.parquet from sf0.1:

- documents: 10 DISJOINT ISOMORPHIC copies. Each copy Caesar-rotates
  letters (a-z and A-Z by the copy index), so per-copy word/shingle
  STATISTICS are preserved exactly while the shingle universes are
  disjoint across copies — candidate-pair volume in the dedup family
  scales exactly linearly, the honest 10x for near-dup plans.
- embeddings: per-copy circular dimension rotation (orthogonal map:
  within-copy cosine/centroid structure preserved exactly; across
  copies the vectors decorrelate), ids offset per copy.

Usage: python3 tools/make_scale10.py [sfDir] [outDir] [copies]
"""
import string
import sys

import duckdb


def main(sf_dir: str, out_dir: str, copies: int, tables=None) -> None:
    def want(t):
        return tables is None or t in tables

    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.sql(f"CREATE VIEW embs AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    n_docs = con.sql("SELECT count(*) FROM docs").fetchone()[0]
    id_stride = 10 ** len(str(n_docs * 10))  # decimal stride keeps ids readable

    if want("documents"):
        # the rotation trick has only 26 distinct images: beyond that,
        # copies would literally repeat (real cross-copy duplicates), which
        # silently inflates the dedup family's true-pair volume — refuse
        # rather than build a dishonest dataset
        assert copies <= 26, "documents: >26 copies repeat the Caesar alphabet"
        lower = string.ascii_lowercase
        upper = string.ascii_uppercase
        doc_parts = []
        for c in range(copies):
            rl = lower[c:] + lower[:c]
            ru = upper[c:] + upper[:c]
            # translate() with from/to alphabets = per-copy Caesar rotation
            doc_parts.append(
                f"SELECT doc_id + {c * id_stride} AS doc_id, "
                f"translate(text, '{lower + upper}', '{rl + ru}') AS text, "
                f"lang, source || '_c{c}' AS source, n_chars "
                f"FROM docs")
        con.sql(f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")

    dim = con.sql("SELECT len(embedding) FROM embs LIMIT 1").fetchone()[0]
    if want("embeddings"):
        assert copies <= dim, "embeddings: >dim copies repeat the rotation"
        emb_parts = []
        for c in range(copies):
            rot = c % dim
            emb_parts.append(
                f"SELECT vec_id + {c * id_stride} AS vec_id, "
                f"(embedding[{rot + 1}:{dim}] || embedding[1:{rot}]) AS embedding"
                f", label FROM embs")
        con.sql(f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)")

    # events: 10 disjoint user populations with the SAME per-user event
    # streams and timeline (user/event ids offset per copy, ts unchanged) —
    # funnel/retention/keyed-state operators see 10x the keys with
    # identical per-key behavior, the honest 10x for user-keyed plans.
    con.sql(f"CREATE VIEW evs AS SELECT * FROM '{sf_dir}/events.parquet'")
    n_users = con.sql("SELECT max(user_id) FROM evs").fetchone()[0]
    u_stride = 10 ** len(str(n_users * 10))
    if want("events"):
        ev_parts = []
        for c in range(copies):
            ev_parts.append(
                f"SELECT event_id + {c * id_stride} AS event_id, ts, "
                f"user_id + {c * u_stride} AS user_id, event_type, value, props "
                f"FROM evs")
        con.sql(f"COPY ({' UNION ALL '.join(ev_parts)}) TO '{out_dir}/events.parquet' (FORMAT PARQUET)")
    # TPC-H: 10 disjoint fact copies with CONSISTENT key offsets (orders/
    # lineitem share the orderkey stride; customer/supplier/part strides
    # flow into their fact foreign keys), dims (region/nation) fixed —
    # the honest 10x for relational plans: fact cardinality scales,
    # dimension cardinality doesn't, join fan-outs per key are unchanged.
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    def stride(table, key):
        n = con.sql(f"SELECT max({key}) FROM {table}").fetchone()[0]
        return 10 ** len(str(n * 10))

    so = stride("orders", "o_orderkey")
    sc = stride("customer", "c_custkey")
    ss = stride("supplier", "s_suppkey")
    sp = stride("part", "p_partkey")

    def copy_union(table, keyed_cols, passthrough):
        if not want(table):
            return
        parts = []
        for c in range(copies):
            sel = ", ".join(
                [f"{col} + {c * st} AS {col}" for col, st in keyed_cols] + passthrough)
            parts.append(f"SELECT {sel} FROM {table}")
        con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{out_dir}/{table}.parquet' (FORMAT PARQUET)")

    for t in ["region", "nation"]:
        if want(t):
            con.sql(f"COPY (SELECT * FROM {t}) TO '{out_dir}/{t}.parquet' (FORMAT PARQUET)")
    copy_union("customer", [("c_custkey", sc)],
               ["c_name", "c_nationkey", "c_acctbal", "c_mktsegment"])
    copy_union("supplier", [("s_suppkey", ss)],
               ["s_name", "s_nationkey", "s_acctbal"])
    copy_union("part", [("p_partkey", sp)],
               ["p_name", "p_brand", "p_type", "p_size", "p_retailprice"])
    copy_union("orders", [("o_orderkey", so), ("o_custkey", sc)],
               ["o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"])
    # l_suppkey is NOT offset by the copy index like the other foreign
    # keys: that would make (l_partkey, l_suppkey) perfectly correlated
    # (copy c's rows all land in partkey island c AND suppkey island c —
    # a diagonal), which is a degenerate geometry the base data does not
    # have: at sf0.1 the two keys are independent per row. A diagonal
    # breaks every 2-D layout claim honestly made on independent keys
    # (Z-order famously loses to a single-key sort on correlated
    # columns — q_zorder_prune's assertion caught exactly this at 26x).
    # Instead each row's supplier copy is (c + l_orderkey) % copies:
    # deterministic, spreads copy c's rows uniformly across ALL supplier
    # islands, preserves join cardinality exactly (every row still
    # matches exactly one supplier; per-supplier-key fan-in totals are
    # unchanged in expectation), and restores the base data's key
    # independence at scale.
    if want("lineitem"):
        parts = []
        for c in range(copies):
            parts.append(
                f"SELECT l_orderkey + {c * so} AS l_orderkey, "
                f"l_partkey + {c * sp} AS l_partkey, "
                f"l_suppkey + {ss} * (({c} + l_orderkey) % {copies}) AS l_suppkey, "
                "l_linenumber, l_quantity, l_extendedprice, l_discount, "
                "l_tax, l_returnflag, l_linestatus, l_shipdate FROM lineitem")
        con.sql(f"COPY ({' UNION ALL '.join(parts)}) TO "
                f"'{out_dir}/lineitem.parquet' (FORMAT PARQUET)")

    print(f"wrote {out_dir}: documents x{copies} (id stride {id_stride}), "
          f"embeddings dim={dim} rotated per copy, "
          f"events x{copies} (user stride {u_stride}), "
          f"tpch facts x{copies} (orderkey stride {so}), dims fixed")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    # optional comma-list of tables to build (default: all) — the 100x
    # step uses this to build only the key-strided tables, where >26
    # copies stay honest
    tbls = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
    import os
    os.makedirs(out, exist_ok=True)
    main(sf, out, k, tbls)
