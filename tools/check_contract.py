"""Drive the driver contract end-to-end: run entry() as a smoke check, then
every queries() entry vs its oracle_sql() in DuckDB at sf0.01, comparing
row-count, schema width, and order-insensitive values (the driver's gate).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent  # noqa: E402
from pyanomalydetector2_spark.sources.tables import TPCH_TABLES  # noqa: E402
from pyanomalydetector2_spark.session import get_spark  # noqa: E402


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    unknown = only - set(ent.queries())
    if unknown:  # a typo must not make the gate pass vacuously
        print(f"unknown query name(s): {sorted(unknown)}")
        return 2
    spark = get_spark(
        cpus=int(os.environ.get("CONTRACT_CPUS", "8")), app_name="contract-check"
    )

    print("== entry() smoke @ sf0.001")
    t0 = time.time()
    df = ent.entry(spark)
    n = df.count()
    print(f"   rows={n} cols={df.columns} ({time.time()-t0:.1f}s)")

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    qs, os_ = ent.queries(), ent.oracle_sql()
    fails = []
    n_run = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        n_run += 1
        t0 = time.time()
        got = normalize(fn(spark, sf).toPandas())
        sql = os_.get(name)
        if sql is None:
            print(f"-- {name}: rows={len(got)} (no oracle, rows-only) "
                  f"({time.time()-t0:.1f}s)")
            if len(got) == 0:
                fails.append((name, "empty result, no oracle"))
            continue
        exp = normalize(con.execute(sql).fetchdf())
        status = "OK"
        if list(got.columns) != list(exp.columns):
            status = f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"ROWS got={len(got)} exp={len(exp)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, exp, check_dtype=False, check_exact=True
                )
            except AssertionError as e:
                status = "VALUES " + str(e).splitlines()[-1][:200]
        flag = "ok" if status == "OK" else "FAIL"
        print(f"-- {name}: rows={len(got)} {flag} ({time.time()-t0:.1f}s)"
              + ("" if status == "OK" else f"\n   {status}"))
        if status != "OK":
            fails.append((name, status))
        elif len(got) == 0:
            fails.append((name, "empty result (matches oracle but weak)"))
    print(f"\n{n_run - len(fails)}/{n_run} OK"
          + (f" (filtered from {len(qs)})" if only else ""))
    for name, s in fails:
        print(f"FAIL {name}: {s}")
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
