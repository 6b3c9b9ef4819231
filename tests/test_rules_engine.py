"""Rule-engine correctness: engineered golden cases per quirk + a batched
randomized property test against the pure-Python oracle (SURVEY.md §5.2)."""

from __future__ import annotations

import random

from wayproblems_spark.rules import problems, way_problems
from wayproblems_spark.rules.catalog import CATALOG, HIGHWAY_VALID

from .conftest import mk_way, ways_df


def run_both(spark, rows):
    got = [
        (r.way_id, r.site, r.sub, r.layer, r.style, r.problem)
        for r in problems(ways_df(spark, rows)).collect()
    ]
    got.sort()
    exp = []
    for row in rows:
        nodes = row[6]
        w = {"tags": row[7], "closed": len(nodes) > 0 and nodes[0] == nodes[-1]}
        for e in way_problems(w):
            exp.append((row[0], e["site"], e["sub"], e["layer"], e["style"], e["problem"]))
    exp.sort()
    return got, exp


def test_catalog_size():
    # 44 live rule families unrolled; the count is pinned so accidental
    # catalogue edits are caught.
    assert len(CATALOG) > 200


def test_quirk_q1_residential_not_public(spark):
    rows = [
        mk_way(1, {"highway": "residential", "access": "private"}),
        mk_way(2, {"highway": "living_street", "vehicle": "private"}),
        mk_way(3, {"highway": "unclassified", "access": "private"}),
    ]
    got, exp = run_both(spark, rows)
    assert got == exp
    # residential/living_street are NOT public (missing-comma bug):
    assert not [g for g in got if g[0] in (1, 2) and "public way" in g[5]]
    assert [g for g in got if g[0] == 3 and "public way" in g[5]]


def test_quirk_q2_proposed_null_arg(spark):
    rows = [mk_way(1, {"highway": "primary", "proposed": "yes"})]
    got, _ = run_both(spark, rows)
    msgs = [g[5] for g in got]
    assert "proposed=primary on highway=(null) causes OSRM to avoid road" in msgs


def test_quirk_q3_permissive_says_designated(spark):
    rows = [mk_way(1, {"highway": "primary", "bicycle": "permissive"})]
    got, exp = run_both(spark, rows)
    assert got == exp
    assert any("bicycle=designated on highway=primary" in g[5] for g in got)


def test_quirk_q4_two_parsers(spark):
    rows = [
        # prefix stoi: "50 mph" passes the maxspeed numeric check
        mk_way(1, {"highway": "primary", "maxspeed": "50 mph", "ref": "B1"}),
        # strict int: "5 " (trailing space) fails the lanes check
        mk_way(2, {"highway": "primary", "lanes": "5 ", "ref": "B1"}),
        # prefix stof: "3.5m" is a valid maxheight float
        mk_way(3, {"highway": "primary", "maxheight": "3.5m", "ref": "B1"}),
        mk_way(4, {"highway": "primary", "maxspeed": "walk", "ref": "B1"}),
    ]
    got, exp = run_both(spark, rows)
    assert got == exp
    assert not [g for g in got if g[0] == 1 and "not numerical" in g[5]]
    assert [g for g in got if g[0] == 2 and "is not integer" in g[5]]
    assert not [g for g in got if g[0] == 3 and "float" in g[5]]
    assert [g for g in got if g[0] == 4 and "not numerical" in g[5]]


def test_quirk_q5_trailing_space_cycleway(spark):
    rows = [
        mk_way(1, {"highway": "residential", "cycleway:left": "foo", "cycleway": "left"}),
        mk_way(2, {"highway": "residential", "cycleway:right": "foo", "cycleway": "right"}),
    ]
    got, exp = run_both(spark, rows)
    assert got == exp
    assert not [g for g in got if g[0] == 1 and "invalid combination" in g[5]]
    assert [g for g in got if g[0] == 2 and "invalid combination" in g[5]]


def test_quirk_q8_truncation(spark):
    long_val = "x" * 400
    rows = [mk_way(1, {"highway": "primary", "type": long_val, "ref": "B1"})]
    got, exp = run_both(spark, rows)
    assert got == exp
    t = [g[5] for g in got if g[5].startswith("type=")][0]
    assert len(t) == 254


def test_quirk_q9_duplicate_emissions(spark):
    rows = [mk_way(1, {"highway": "primary", "ref": "-"})]
    got, exp = run_both(spark, rows)
    assert got == exp
    dup = [g for g in got if g[5] == "ref=- seems broken"]
    assert {g[3] for g in dup} == {"ref", "wayproblems"} and len(dup) == 2


def test_turn_lane_checks(spark):
    rows = [
        mk_way(1, {"highway": "primary", "oneway": "yes", "ref": "B1",
                   "lanes": "3", "turn:lanes": "left|through|right"}),
        # monotonicity violation right→left
        mk_way(2, {"highway": "primary", "oneway": "yes", "ref": "B1",
                   "lanes": "2", "turn:lanes": "right|left"}),
        # unknown token stops the order scan silently but emits unknown-turn
        mk_way(3, {"highway": "primary", "oneway": "yes", "ref": "B1",
                   "lanes": "2", "turn:lanes": "zz|left"}),
        # pipe-count mismatch with non-int lanes renders INT_MAX like %d
        mk_way(4, {"highway": "primary", "oneway": "yes", "ref": "B1",
                   "lanes": "abc", "turn:lanes": "left|right"}),
        # semicolon+pipe tokenization, compressed
        mk_way(5, {"highway": "primary", "oneway": "yes", "ref": "B1",
                   "lanes": "2", "turn:lanes": "left|;right"}),
    ]
    got, exp = run_both(spark, rows)
    assert got == exp
    assert not [g for g in got if g[0] == 1 and g[1] >= 30 and g[1] <= 36]
    assert [g for g in got if g[0] == 2 and "has turn ...right|left..." in g[5]]
    assert [g for g in got if g[0] == 3 and "contains lane turn zz" in g[5]]
    assert not [g for g in got if g[0] == 3 and "has turn" in g[5]]
    assert [g for g in got if g[0] == 4 and "lanes=2147483647 does not match" in g[5]]


def test_circular_way(spark):
    rows = [
        mk_way(1, {"highway": "residential"}, nodes=[1, 2, 3, 1]),
        mk_way(2, {"highway": "residential", "junction": "roundabout"}, nodes=[1, 2, 3, 1]),
        mk_way(3, {"highway": "residential", "area": "yes"}, nodes=[1, 2, 3]),
        mk_way(4, {"highway": "track"}, nodes=[1, 2, 3, 1]),  # track not in circular list
    ]
    got, exp = run_both(spark, rows)
    assert got == exp
    assert [g for g in got if g[0] == 1 and "Circular way" in g[5]]
    assert not [g for g in got if g[0] == 2]
    assert [g for g in got if g[0] == 3 and "area=yes on unclosed way" in g[5]]
    assert not [g for g in got if g[0] == 4 and "Circular" in g[5]]


def test_gate(spark):
    rows = [
        mk_way(1, {"highway": "bus_stop", "noexit": "yes"}),
        mk_way(2, {"railway": "rail", "noexit": "yes"}),
        mk_way(3, {"highway": "proposed", "noexit": "yes"}),
    ]
    got, exp = run_both(spark, rows)
    assert got == exp == []


# ---------------------------------------------------------------------------
# Batched randomized property test: one Spark job over many random ways.
# ---------------------------------------------------------------------------

_KEYS = [
    "highway", "layer", "ref", "maxspeed", "maxspeed:forward", "maxspeed:backward",
    "maxspeed:hgv", "maxheight", "maxwidth", "lanes", "lanes:forward",
    "lanes:backward", "turn:lanes", "turn:lanes:forward", "destination",
    "destination:lanes", "sidewalk", "segregated", "shoulder", "oneway",
    "construction", "proposed", "tracktype", "surface", "tunnel", "bridge",
    "junction", "name", "footway", "hazmat", "hgv", "lit", "embankment",
    "cutting", "overtaking", "overtaking:forward", "overtaking:backward",
    "type", "source:maxspeed", "maxspeed:source", "maxspeed:type", "noexit",
    "bicycle", "foot", "access", "goods", "motor_vehicle", "motorcycle",
    "motorcar", "vehicle", "psv", "mofa", "moped", "horse", "cycleway",
    "cycleway:left", "cycleway:right", "entrance", "waterway", "building",
    "service", "area", "motorroad", "agricultural", "atv", "bus",
]

_VALUES = [
    "yes", "no", "true", "false", "0", "1", "-1", "2", "8", "9", "10", "11",
    "-10", "-11", "50", "100", "30", "none", "signals", "walk", "50 mph",
    "1.5", "1.8m", "3.5", "7.5", "x", "left", "right", "both", "separate",
    "track", "lane", "sidepath", "opposite", "opposite_lane", "private",
    "permissive", "customers", "destination", "designated", "use_sidepath",
    "dismount", "grade1", "grade3", "paved", "asphalt", "dirt", "route",
    "roundabout", "sidewalk", "crossing", "DE:urban", "DE:zone30", "sign",
    "avalanche_protector", "building_passage", "limited", "24/7", "caution",
    "forward", "backward", "widening", "minor", "residential", "construction",
    "left|right", "left|through|right", "right|left", "zz|left", "left|;none",
    "through|through", "|left", "left|", " 5", "5 ", "+5", "abc",
]

_HIGHWAYS = list(HIGHWAY_VALID) + ["bus_stop", "proposed", "rail", None]


def test_randomized_against_oracle(spark):
    rng = random.Random(42)
    rows = []
    for i in range(600):
        tags = {}
        hw = rng.choice(_HIGHWAYS)
        if hw is not None:
            tags["highway"] = hw
        for _ in range(rng.randint(0, 10)):
            tags[rng.choice(_KEYS)] = rng.choice(_VALUES)
        nodes = [1, 2, 3, 1] if rng.random() < 0.3 else [1, 2, 3]
        rows.append(mk_way(i, tags, nodes=nodes))
    got, exp = run_both(spark, rows)
    assert got == exp
