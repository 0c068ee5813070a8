#!/usr/bin/env python
"""Scale a driver testdata dir K× with referential integrity intact.

VERDICT r7 item 4: the bench needs a measured scaling exponent, not
an eyeballed "the plans look linear". This replicates a source SF dir
(default sf0.1) K times (default 10 → "sf1") with every key column
offset per replica so joins keep their per-key cardinalities and
selectivities:

* dense 0-based TPC-H keys offset by their table's row count
  (c_custkey, o_orderkey/o_custkey, l_orderkey/l_partkey/l_suppkey,
  p_partkey, s_suppkey),
* nation/region copied once (fixed-size dims, as in TPC-H itself),
* events offset on event_id (by count) and user_id (by max+1) so the
  user population grows with the data (sessionization keys scale),
* documents offset on doc_id by the doc count (the dense consecutive
  doc_id space convention survives: 10 dense shards = one dense
  space). Document TEXT gets a deterministic per-word replica suffix
  in replicas 1..K-1 (replica 0 verbatim): identical text across
  replicas would make EVERY doc a K-way duplicate, and dedup queries
  would then pay a genuinely quadratic OUTPUT blowup (K(K-1)/2 pairs
  per doc) that measures the replica construction, not the engine.
  With the suffix, cross-replica shingle Jaccard is ~0 while each
  replica keeps the generator's own duplicate structure, so dedup
  output grows linearly like a real corpus. n_chars is recomputed,
* embeddings offset on vec_id by the DOC count, because embeddings
  align with documents on vec_id = doc_id — the alignment invariant
  must survive scaling. The fixed ``vec_id < N_QUERY_VECS`` query set
  then stays constant while the corpus grows, which is exactly the
  scaling shape an ANN benchmark wants. Vectors in replicas 1..K-1
  are coordinate-ROTATED by the replica id: a coordinate permutation
  is orthogonal, so within-replica pairwise geometry (dots, norms,
  clusters) is preserved EXACTLY while cross-replica cosine drops to
  ~0 — without this, every vector has K-1 identical twins and the
  embedding-dedup ops pay the same K²-duplicate output blowup as
  un-suffixed text.

Values (prices, dates, text, vectors) are untouched — only keys move —
so per-row compute is identical and timing ratios measure the ENGINE's
scaling, not data drift.

Usage: python tools/make_scaled_sf.py [--src DIR] [--dst DIR] [--k K]
Deterministic; safe to re-run (overwrites the target files).
"""

from __future__ import annotations

import argparse
import os

import duckdb

# (table, [(key_col, offset_expr_base)]) — offset base "count:<t>"
# uses table t's row count, "maxp1:<t>.<c>" uses max(c)+1 of table t
KEYED = {
    "customer": [("c_custkey", "count:customer")],
    "orders": [
        ("o_orderkey", "count:orders"),
        ("o_custkey", "count:customer"),
    ],
    "lineitem": [
        ("l_orderkey", "count:orders"),
        ("l_partkey", "count:part"),
        ("l_suppkey", "count:supplier"),
    ],
    "part": [("p_partkey", "count:part")],
    "supplier": [("s_suppkey", "count:supplier")],
    "events": [
        ("event_id", "count:events"),
        ("user_id", "maxp1:events.user_id"),
    ],
    "documents": [("doc_id", "count:documents")],
    # vec_id = doc_id alignment: offset by the DOCUMENT count
    "embeddings": [("vec_id", "count:documents")],
}
COPY_ONCE = ["nation", "region"]


def scale_dir(
    src: str, dst: str, k: int, tables: list[str] | None = None
) -> None:
    """``tables`` restricts which KEYED tables are replicated (the
    deep 100x dedup/ANN ladder only needs documents+embeddings —
    replicating lineitem 100x would cost ~1 GB for queries that never
    read it). Offsets always come from the SOURCE counts, so a subset
    build is bit-identical to the same tables in a full build."""
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    units: dict[str, int] = {}
    for t in KEYED:
        units[f"count:{t}"] = con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]
    units["maxp1:events.user_id"] = (
        con.execute(
            f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'"
        ).fetchone()[0]
    )

    for t in COPY_ONCE:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT PARQUET)"
        )

    keyed = (
        KEYED
        if tables is None
        else {t: KEYED[t] for t in tables if t in KEYED}
    )
    for t, keys in keyed.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        offs = {c: units[u] for c, u in keys}

        def col_expr(c: str, t: str = t, offs: dict = offs) -> str:
            if c in offs:
                return f"{c} + r.i * {offs[c]} AS {c}"
            if t == "documents" and c == "text":
                # de-duplicate text across replicas (see module
                # docstring): suffix every word with the replica id
                return (
                    "CASE WHEN r.i = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', "
                    "'\\1' || CAST(r.i AS VARCHAR), 'g') END AS text"
                )
            if t == "documents" and c == "n_chars":
                return (
                    "length(CASE WHEN r.i = 0 THEN text ELSE "
                    "regexp_replace(text, '(\\S+)', "
                    "'\\1' || CAST(r.i AS VARCHAR), 'g') END) "
                    "AS n_chars"
                )
            if t == "embeddings" and c == "embedding":
                # per-replica coordinate rotation (orthogonal — see
                # module docstring); 1-based inclusive list slices.
                # Rotation amount is 1 + (i-1) % (dim-1), never 0:
                # a plain i % dim would be the IDENTITY whenever
                # i is a multiple of dim (e.g. --k > 64 on dim-64
                # vectors), silently reintroducing the exact-twin
                # blowup the rotation exists to prevent.
                rot = "(1 + (r.i - 1) % (len(embedding) - 1))"
                return (
                    "CASE WHEN r.i = 0 THEN embedding ELSE "
                    f"embedding[{rot} + 1:] || "
                    f"embedding[1:{rot}] END "
                    "AS embedding"
                )
            return c

        proj = ", ".join(col_expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {proj} FROM '{src}/{t}.parquet' "
            f"CROSS JOIN (SELECT unnest(range({k})) AS i) r) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
        n0, n1 = units[f"count:{t}"], con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        assert n1 == k * n0, (t, n0, n1)
        print(f"{t}: {n0} -> {n1}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/repo/.benchdata/sf1")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset of keyed tables to replicate",
    )
    args = ap.parse_args()
    scale_dir(
        args.src,
        args.dst,
        args.k,
        args.tables.split(",") if args.tables else None,
    )


if __name__ == "__main__":
    main()
