#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<tag>/.

Usage: python dev/capture_plans.py <tag_suffix> <query> [<query> ...]
Writes plans/r11/<query>_<tag_suffix>.txt for each query.

The judge reads these files to check plan claims against the code; the
round contract requires a before/after pair for every query touched.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(out_dir, exist_ok=True)

    from datafusion_comet_spark.queries import load_all
    from datafusion_comet_spark.session import get_session

    registry = load_all()
    spark = get_session(app_name="dcs-capture-plans")
    for name in names:
        df = registry[name].fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
