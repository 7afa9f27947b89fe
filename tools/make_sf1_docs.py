"""Measurement-only sf1.0 documents/embeddings scaling (optimization r06).

make_sf1.py deliberately copies documents/embeddings verbatim (naive
replication plants 10-cliques of exact duplicates and explodes every
pair-generation ORACLE). The driver's own sf1.0 (BENCH_r05.json) clearly
scales the text/audio corpora too — text_embed_near_dup 95.7 s at sf1.0 vs
1.6 s at sf0.1 — so this tool produces a BENCH-ONLY sf1.0 tier whose
documents and embeddings are 10x while keeping cross-replica similarity
at noise level so pair outputs grow ~linearly, not quadratically:

- documents: replica k > 0 appends a per-replica suffix to EVERY token
  (disjoint vocab per replica -> no cross-replica shingle/LSH collisions;
  within-replica dup structure is byte-identical to sf0.1). n_chars is
  recomputed from the rewritten text. doc_id shifts by k * (max+1).
- embeddings: replica k > 0 applies a seeded per-replica permutation of
  the 64 dims (orthogonal transform: within-replica cosines are EXACT,
  cross-replica cosines are generic noise). vec_id shifts by k * (max+1).

This tier is for optimization measurement only; correctness vs the DuckDB
oracle is checked at the driver-provided small SFs.

Usage: python tools/make_sf1_docs.py [dir]   (default /root/bench_sf1.0)
Run AFTER make_sf1.py has populated the dir; overwrites the two tables.
"""

from __future__ import annotations

import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/root/bench_sf1.0"
    con = duckdb.connect()
    con.execute("PRAGMA threads=8")
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SRC}/documents.parquet')"
    )
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SRC}/embeddings.parquet')"
    )

    max_doc = con.execute("SELECT max(doc_id) + 1 FROM documents").fetchone()[0]
    con.execute(
        f"""
        COPY (
          SELECT (doc_id + k * {max_doc})::BIGINT AS doc_id,
                 CASE WHEN k = 0 THEN text
                      ELSE array_to_string(
                        list_transform(string_split(text, ' '),
                                       t -> t || 'q' || k::VARCHAR), ' ')
                 END AS text,
                 lang, source,
                 CASE WHEN k = 0 THEN n_chars
                      ELSE length(array_to_string(
                        list_transform(string_split(text, ' '),
                                       t -> t || 'q' || k::VARCHAR), ' '))
                 END::BIGINT AS n_chars
          FROM documents CROSS JOIN range({K}) r(k)
          ORDER BY k, doc_id
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/documents.parquet')"
    ).fetchone()[0]
    print(f"documents: {n} rows ({K}x, per-replica token suffix)")

    dims = con.execute(
        "SELECT len(embedding) FROM embeddings LIMIT 1"
    ).fetchone()[0]
    max_vec = con.execute("SELECT max(vec_id) + 1 FROM embeddings").fetchone()[0]
    rng = random.Random(1742)
    perms = []
    for k in range(K):
        p = list(range(1, dims + 1))  # DuckDB list_select is 1-based
        if k > 0:
            rng.shuffle(p)
        perms.append(p)
    cases = " ".join(
        f"WHEN k = {k} THEN list_select(embedding, {perms[k]})"
        for k in range(K)
    )
    con.execute(
        f"""
        COPY (
          SELECT (vec_id + k * {max_vec})::BIGINT AS vec_id,
                 CASE {cases} END AS embedding,
                 label
          FROM embeddings CROSS JOIN range({K}) r(k)
          ORDER BY k, vec_id
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{out}/embeddings.parquet')"
    ).fetchone()[0]
    print(f"embeddings: {n} rows ({K}x, per-replica dim permutation)")


if __name__ == "__main__":
    main()
