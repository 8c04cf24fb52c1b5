#!/usr/bin/env python
"""Differential probe REPL — the corpus-authoring workflow tool.

Feed candidate SQL (one statement per line, or a file via argv) and
get a SAME/DIFF/SPARK-FAIL/DUCK-FAIL verdict per statement, with both
engines' first rows on DIFF.  This is how every tests/sql/ file in
this repo was authored: probe the construct on both engines FIRST,
then write the corpus file as `query` (SAME), `query tolerance=`
(float DIFF within noise), or `query spark_only` + value pin
(divergence — and a COMPAT.md row).

Usage:
    python dev/probe_shared.py 'SELECT 1 AS x' 'SELECT split_part(...)'
    python dev/probe_shared.py candidates.sql     # one query per line
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import duckdb

    from datafusion_comet_spark.session import get_session

    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return
    if len(args) == 1 and args[0].endswith(".sql"):
        cands = [
            ln.strip()
            for ln in open(args[0])
            if ln.strip() and not ln.strip().startswith("--")
        ]
    else:
        cands = args

    spark = get_session(app_name="probe-shared")
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    for q in cands:
        try:
            s = [tuple(r) for r in spark.sql(q).collect()]
        except Exception as e:
            print(f"SPARK-FAIL | {q[:70]} | {str(e).splitlines()[0][:70]}")
            continue
        try:
            dd = duck.execute(q).fetchall()
        except Exception as e:
            print(f"DUCK-FAIL  | {q[:70]} | {str(e).splitlines()[0][:70]}")
            continue
        same = len(s) == len(dd) and all(
            str(a) == str(b)
            for ra, rb in zip(s, dd)
            for a, b in zip(ra, rb)
        )
        tag = "SAME " if same else "DIFF "
        print(f"{tag} | {q[:70]}")
        if not same:
            print(f"      spark: {s[:3]}")
            print(f"      duck : {dd[:3]}")
    spark.stop()


if __name__ == "__main__":
    main()
