"""Materialize an sf1.0 tier (VERDICT r03 next-round #3) from the driver's
read-only sf0.1 parquet by deterministic 10× id-shifted replication.

/root/testdata is driver-owned and read-only, and its generator is not
published — so the sf1.0 tier derives from sf0.1 itself: each fact-table
row is replicated K=10 times with every surrogate/foreign key shifted by
k·(max_key+1), preserving ALL schemas, FK relationships, and per-replica
value distributions exactly. Consequences, by design:

- relational/stats/events queries grow ~linearly in rows while
  per-replica aggregates (means, quantiles, PSI) stay identical to sf0.1
  up to a deliberate < 1e-5 jitter on replicated events values (see the
  events special-case below) — a built-in correctness invariant on top of
  the DuckDB oracle;
- dimension tables (region, nation) stay fixed, like TPC-H;
- documents/embeddings are carried over UNCHANGED: naive text/vector
  replication would plant 10-cliques of exact duplicates, exploding every
  pair-generation oracle to O(replicas²·groups) rows — a property of the
  synthetic replication, not of the engine. The dedup/ANN scale story is
  owned by the capped banded machinery + its planted-hot-bucket pytests;
  their oracles stay at the sf0.1 corpus size. (Documented exclusion per
  VERDICT r03 #3.)

Usage: python tools/make_sf1.py [out_dir]   (default /tmp/testdata_sf1.0)
Deterministic: re-running produces content-identical tables (row order
within a parquet file may vary with DuckDB's thread scheduling; every
consumer — contract queries and oracle alike — is order-insensitive).
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10

# table → {column: key-space it shifts in}; absent column = copied verbatim
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
}
COPY_ONLY = ["region", "nation", "documents", "embeddings"]
# key space → (table, column) that defines its extent
KEY_EXTENT = {
    "custkey": ("customer", "c_custkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "partkey": ("part", "p_partkey"),
    "orderkey": ("orders", "o_orderkey"),
    "eventid": ("events", "event_id"),
    "userid": ("events", "user_id"),
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1.0"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute("PRAGMA threads=8")
    for t in list(SHIFTS) + COPY_ONLY:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SRC}/{t}.parquet')"
        )

    extent = {
        name: con.execute(f"SELECT max({col}) + 1 FROM {tbl}").fetchone()[0]
        for name, (tbl, col) in KEY_EXTENT.items()
    }

    for t in COPY_ONLY:
        con.execute(
            f"COPY (SELECT * FROM {t}) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    for t, shifts in SHIFTS.items():
        cols = [
            c[0]
            for c in con.execute(f"DESCRIBE SELECT * FROM {t}").fetchall()
        ]

        def expr(c: str) -> str:
            if c in shifts:
                return f"({c} + k * {extent[shifts[c]]})::BIGINT AS {c}"
            if t == "events" and c == "value":
                # replicas get a deterministic sub-1e-5 jitter: series
                # counts are often powers of two, so an UNperturbed
                # replica's mean lands EXACTLY on a 6-decimal half
                # boundary (sum/64 is an exact binary scale) and Spark's
                # vs DuckDB's ulp-different float-sum orders round to
                # opposite sides. The k=0 replica stays byte-pristine.
                # 7.3e-10 multiplier (not a clean decimal/binary scale):
                # the jitter fills the low mantissa bits with hash noise so
                # no per-series mean or sum can sit EXACTLY on a 6-decimal
                # half boundary (a 1e-9 decimal jitter recreated them — any
                # decimal-terminating grid divided by a power-of-two count
                # lands back on exact halves)
                return (
                    "(value + CASE WHEN k = 0 THEN 0.0 ELSE "
                    f"(((event_id + k * {extent['eventid']}) * 2654435761) "
                    "% 9973) * 7.3e-10 END) AS value"
                )
            return c

        sel = ", ".join(expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {sel} FROM {t} CROSS JOIN range({K}) r(k) "
            f"ORDER BY k, {cols[0]}) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows (10x)")


if __name__ == "__main__":
    main()
