"""Dump `.explain("formatted")` for contract queries to plans/r06/.

Usage: python tools/dump_plans.py <suffix> [query ...]
  suffix: 'before' or 'after' (file name tag)
  query:  subset; default = every queries() entry

Plans are built at sf0.01 (plan SHAPE is sf-invariant for these queries;
building at the small sf keeps the dump cheap and collection-free —
explain only, nothing is executed).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as ent  # noqa: E402
from pyanomalydetector2_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.01")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r06")


def main() -> None:
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(cpus=8, app_name="dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in ent.queries().items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # streaming drains execute on build; skip
            txt = f"<plan unavailable: {type(e).__name__}: {e}>"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "ok")


if __name__ == "__main__":
    main()
