"""q34 production-catalogue oracle: the DuckDB render target (rules/sqlgen)
and the synthesized corpus (rules/synth) against the pure-Python oracle and
the Spark engine.

Layered evidence (cheapest first):
1. py-oracle == generated-DuckDB-SQL, full multiset, sf0.001 corpus.
2. Every live catalogue site fires in the sf0.01 corpus (DuckDB side only —
   seconds; the driver then hash-verifies Spark == DuckDB at the same SF).
3. Spark synthesized tags/closed == the Python closed form on a sample
   (links render target #1 to render target #2 of rules/synth).
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from wayproblems_spark.rules.catalog import CATALOG, HIGHWAY_VALID
from wayproblems_spark.rules.emitters import Emit
from wayproblems_spark.rules.oracle import way_problems
from wayproblems_spark.rules.sqlgen import catalog_oracle_sql
from wayproblems_spark.rules.synth import synth_way_py, synth_ways_spark

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _con(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{sf_dir}/lineitem.parquet')"
    )
    return con


def _way_ids(con):
    return [
        r[0]
        for r in con.sql(
            "SELECT DISTINCT CAST(l_orderkey AS BIGINT)*8 + "
            "CAST(l_linenumber AS BIGINT) FROM lineitem"
        ).fetchall()
    ]


def _dead_sites():
    return {
        i
        for i, e in enumerate(CATALOG)
        if isinstance(e, Emit)
        and e.msg.template == "highway=%s should only be used on nodes"
    }


def test_sqlgen_matches_python_oracle_multiset():
    con = _con(SF001)
    exp = Counter()
    for i in _way_ids(con):
        w = synth_way_py(i)
        if w["tags"].get("highway") not in HIGHWAY_VALID:
            continue
        for e in way_problems({"tags": w["tags"], "closed": w["closed"]}):
            exp[(i, e["site"], e["sub"], e["layer"], e["style"], e["problem"])] += 1
    got = Counter(
        (int(a), int(b), int(c), d, e, f)
        for a, b, c, d, e, f in con.sql(catalog_oracle_sql()).fetchall()
    )
    assert got == exp and sum(got.values()) > 40000


def test_all_live_sites_fire_in_driver_corpus():
    con = _con(SF01)
    fired = {
        int(r[0])
        for r in con.sql(
            f"SELECT DISTINCT site FROM ({catalog_oracle_sql()})"
        ).fetchall()
    }
    missing = sorted(set(range(len(CATALOG))) - _dead_sites() - fired)
    assert not missing, f"sites never fired in synth corpus: {missing}"


@pytest.mark.usefixtures("spark")
def test_spark_synth_matches_python(spark):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").limit(400)
    rows = synth_ways_spark(li).collect()
    assert rows
    for r in rows:
        w = synth_way_py(r.way_id)
        assert dict(r.tags) == w["tags"], r.way_id
        closed = r.nodes[0] == r.nodes[-1]
        assert closed == w["closed"], r.way_id
