#!/usr/bin/env python
"""Driver-style oracle checker (round-7 optimization guardrail).

Runs selected ``queries()`` entries on Spark and their ``oracle_sql()``
text on DuckDB over the same sf dir, then compares row count, schema
(column names in order) and an md5 over the sorted csv rendering — the
same discipline as the driver's correctness harness. Usage::

    python tools/oracle_check.py q55_overlay_sql q15_pip_sql
    python tools/oracle_check.py --sf /root/testdata/sf0.01 all
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _md5_frame(pdf):
    import pandas as pd

    pdf = pdf.copy()
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
            drop=True
        )
    csv = pdf.to_csv(index=False)
    return hashlib.md5(csv.encode()).hexdigest()


def main():
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    import duckdb

    import __spark_entry__ as em
    from wayproblems_spark.session import get_spark

    qs = em.queries()
    oracles = em.oracle_sql()
    names = list(qs) if args == ["all"] else args

    spark = get_spark(app_name="oracle-check", master="local[8]")
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')"
        )

    results = {}
    for name in names:
        if name not in qs:
            results[name] = {"err": "unknown query"}
            continue
        if name not in oracles:
            results[name] = {"err": "rows-only (no oracle sql)"}
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            spdf = sdf.toPandas()
            opdf = con.execute(oracles[name]).df()
            res = {
                "rows_match": len(spdf) == len(opdf),
                "schema_match": sorted(spdf.columns) == sorted(opdf.columns),
                "hash_match": _md5_frame(spdf) == _md5_frame(opdf),
                "spark_rows": len(spdf),
                "oracle_rows": len(opdf),
                "err": None,
            }
        except Exception as e:  # noqa: BLE001
            res = {"err": f"{type(e).__name__}: {e}"}
        results[name] = res
        print(name, json.dumps(res))
    bad = [n for n, r in results.items() if r.get("err") or not all(
        r.get(k) for k in ("rows_match", "schema_match", "hash_match")
    )]
    print(json.dumps({"checked": len(results), "failed": bad}))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
