#!/usr/bin/env python3
"""Build the Nx scale-step dataset (dev-side tool, like compare_oracle.py).

Writes /tmp/graft_sf1/{documents,embeddings}.parquet from sf0.1:

- documents: N DISJOINT ISOMORPHIC copies. Each copy applies a seeded
  PSEUDO-RANDOM PERMUTATION of the letter alphabet (a-z, mirrored onto
  A-Z; copy 0 is the identity). An injective character map preserves
  per-copy word identity structure, word/shingle STATISTICS, and
  n_chars exactly — the same invariants as the original Caesar
  rotation — but the image space is 26! permutations instead of 26
  rotations, so the builder is non-degenerate at ANY copy count
  (r14's 26-copy ceiling was exactly the Caesar alphabet running
  out). Cross-copy shingle universes are disjoint up to permutation
  coincidences (a shingle collides across two copies only if the two
  permutations agree on EVERY letter in it; random permutation pairs
  agree on ~1 of 26 letters — Poisson(1) fixed points — so multi-
  letter shingles essentially never collide), and a guard below
  REFUSES to build if any two copies' permutations agree on more than
  12 of 26 positions (P < 1e-9 per pair for honest PRNG output —
  tripping it means the seeding is broken). Candidate-pair volume in
  the dedup family therefore scales exactly linearly: the honest Nx
  for near-dup plans.
- embeddings: per-copy SIGNED PERMUTATION of the dimensions (seeded
  Fisher-Yates order + seeded sign flips; copy 0 identity). A signed
  permutation is orthogonal, so within-copy cosine/centroid structure
  is preserved EXACTLY (the invariant the circular rotation gave),
  while across copies vectors decorrelate like random sign patterns;
  the image space is 2^dim * dim! instead of the rotation's dim
  shifts, so >dim copies stay honest. Sign flips are pure negation
  (sign-bit flip) — FLOAT values round-trip bit-exactly.

Usage: python3 tools/make_scale10.py [sfDir] [outDir] [copies] [tables]
"""
import random
import string
import sys

import duckdb


def letter_perm(copy_idx: int):
    """Deterministic per-copy permutation of a-z (copy 0 = identity)."""
    letters = list(string.ascii_lowercase)
    if copy_idx == 0:
        return letters
    rng = random.Random(0xD0C5 + copy_idx)  # fixed app seed + copy index
    rng.shuffle(letters)
    return letters


def signed_dim_perm(copy_idx: int, dim: int):
    """Deterministic per-copy (order, signs) over dims (copy 0 = identity)."""
    order = list(range(dim))
    signs = [1] * dim
    if copy_idx == 0:
        return order, signs
    rng = random.Random(0xE4B5 + copy_idx)
    rng.shuffle(order)
    signs = [rng.choice((1, -1)) for _ in range(dim)]
    return order, signs


def main(sf_dir: str, out_dir: str, copies: int, tables=None) -> None:
    def want(t):
        return tables is None or t in tables

    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.sql(f"CREATE VIEW embs AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    n_docs = con.sql("SELECT count(*) FROM docs").fetchone()[0]
    id_stride = 10 ** len(str(n_docs * 10))  # decimal stride keeps ids readable

    if want("documents"):
        # honesty guard, generalized from the Caesar <=26 ceiling: any two
        # copies' alphabet permutations must be nearly disjoint as char
        # maps, or cross-copy text would overlap (real duplicate content
        # silently inflating the dedup family's true-pair volume). Random
        # permutation pairs agree on Poisson(1) positions; >12 of 26 has
        # P < 1e-9 per pair and means the seeding is degenerate — refuse.
        perms = [letter_perm(c) for c in range(copies)]
        for i in range(copies):
            for j in range(i + 1, copies):
                agree = sum(1 for a, b in zip(perms[i], perms[j]) if a == b)
                assert agree <= 12, (
                    f"documents: copies {i},{j} share {agree}/26 letter "
                    "mappings — degenerate permutation seeding")
        lower = string.ascii_lowercase
        upper = string.ascii_uppercase
        doc_parts = []
        for c in range(copies):
            rl = "".join(perms[c])
            ru = rl.upper()
            # translate() with from/to alphabets = per-copy letter bijection
            doc_parts.append(
                f"SELECT doc_id + {c * id_stride} AS doc_id, "
                f"translate(text, '{lower + upper}', '{rl + ru}') AS text, "
                f"lang, source || '_c{c}' AS source, n_chars "
                f"FROM docs")
        con.sql(f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)")

    dim = con.sql("SELECT len(embedding) FROM embs LIMIT 1").fetchone()[0]
    if want("embeddings"):
        # honesty guard: signed permutations must be pairwise distinct (two
        # identical maps = literally duplicated vectors across copies)
        sperms = [signed_dim_perm(c, dim) for c in range(copies)]
        assert len({(tuple(o), tuple(s)) for o, s in sperms}) == copies, \
            "embeddings: repeated signed dimension permutation across copies"
        emb_parts = []
        for c in range(copies):
            order, signs = sperms[c]
            # negation (sign-bit flip) keeps FLOAT bit-exact; list_value of
            # FLOAT terms keeps FLOAT[] — asserted against the input schema
            # after the write below
            terms = ", ".join(
                (f"embedding[{d + 1}]" if s == 1 else f"-embedding[{d + 1}]")
                for d, s in zip(order, signs))
            emb_parts.append(
                f"SELECT vec_id + {c * id_stride} AS vec_id, "
                f"list_value({terms}) AS embedding, label FROM embs")
        con.sql(f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)")
        in_type = con.sql("SELECT typeof(embedding) FROM embs LIMIT 1").fetchone()[0]
        out_type = con.sql(
            f"SELECT typeof(embedding) FROM '{out_dir}/embeddings.parquet' LIMIT 1"
        ).fetchone()[0]
        assert out_type == in_type, (
            f"embeddings: element type drifted {in_type} -> {out_type}")

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

    print(f"wrote {out_dir}: documents x{copies} (letter-permuted, id stride "
          f"{id_stride}), embeddings dim={dim} signed-permuted per copy, "
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
