"""Physical-plan audit of every driver-contract query: shuffle count,
pushed filters, scan schemas, broadcast joins, whole-stage-codegen spans.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent  # noqa: E402
from pyanomalydetector2_spark.plans import audit_plan  # noqa: E402
from pyanomalydetector2_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def audit(name: str, df) -> dict:
    # audit_plan collects THIS DataFrame's own QueryExecution so AQE
    # finalizes the adaptive plan (sf0.01 outputs are small, collect is
    # safe here)
    return {"name": name, **audit_plan(df)}


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark(cpus=8, app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'query':24} shfl bcast gsort codegen py pushed scan_cols")
    for name, fn in ent.queries().items():
        if only and name not in only:
            continue
        a = audit(name, fn(spark, SF))
        print(
            f"{a['name']:24} {a['shuffles']:4} {a['broadcasts']:5} "
            f"{a['sorts_global']:5} {a['codegen_spans']:7} {a['python_nodes']:2} "
            f"{len(a['pushed']):6} {a['scan_cols']}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
