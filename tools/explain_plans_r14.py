"""Dump .explain('formatted') for named queries to plans/r14/<name>_<tag>.txt
— the optimization round's before/after plan evidence.

Usage: python tools/explain_plans_r14.py <before|after> name [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from apache_beam_challange_spark.session import get_spark
    import __spark_entry__ as e

    spark = get_spark("explain_r14")
    qs = e.all_queries()
    out_dir = os.path.join("/root/repo", "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
