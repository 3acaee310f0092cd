"""Capture .explain('formatted') for named registry queries to
plans/<tag>/<query>_<suffix>.txt.

    python tools/capture_plans.py --tag r15 --suffix after q1 q2 ...

Stream queries execute their lifecycle during DataFrame construction;
the captured plan is the final declared frame (noted in the header).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="after")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--outdir", default=None)
    args = ap.parse_args()

    from xsarsea_spark.session import get_session
    from xsarsea_spark.suite import REGISTRY

    spark = get_session(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = args.outdir or os.path.join(here, "plans", args.tag)
    os.makedirs(outdir, exist_ok=True)
    for name in args.queries:
        try:
            df = REGISTRY[name].spark(spark, args.sf)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:
            plan = f"CAPTURE FAILED: {exc}"
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_scan = plan.count("Scan parquet")
        n_py = (plan.count("BatchEvalPython")
                + plan.count("ArrowEvalPython")
                + plan.count("MapInPandas")
                + plan.count("FlatMapGroupsInPandas")
                + plan.count("MapInArrow"))
        print(f"{name}: Exchange={n_ex} parquet_scans={n_scan} "
              f"python_nodes={n_py} -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
