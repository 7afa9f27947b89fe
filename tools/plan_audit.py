"""Physical-plan audit of every driver-contract query: shuffle count,
pushed filters, scan schemas, broadcast joins, whole-stage-codegen spans.

Usage: python tools/plan_audit.py [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as ent  # noqa: E402
from pyanomalydetector2_spark.plans import explain_formatted, physical_plan  # noqa: E402
from pyanomalydetector2_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def audit(name: str, df) -> dict:
    # execute THIS DataFrame's own QueryExecution so AQE finalizes the
    # adaptive plan (a noop write wraps the plan in a NEW QueryExecution
    # and leaves df's plan isFinalPlan=false — codegen markers and runtime
    # join-strategy switches only appear in the FINAL plan of the executed
    # instance; sf0.01 outputs are small, collect is safe here)
    df.collect()
    plan = physical_plan(df)
    fmt = explain_formatted(df)
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", fmt)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", fmt)
    return {
        "name": name,
        "shuffles": plan.count("Exchange hashpartitioning"),
        "broadcasts": plan.count("BroadcastHashJoin"),
        "sorts_global": plan.count("Exchange rangepartitioning"),
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", plan))),
        "python_nodes": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
        "pushed": [p for p in pushed if p],
        "scan_cols": [len(s.split(",")) for s in schemas],
    }


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
