"""Every emission site fires at least once (FIXTURES.md §2: one engineered
way per emission site), and Spark == oracle on all of them.

Exception: site for "highway=%s should only be used on nodes"
(wayproblems.cpp:740-748) is unreachable POST-GATE — its trigger values
(bus_stop, stop, ...) are not in the highway_wecare whitelist, so the C++
can never emit it either. It is kept for call-site parity and documented
dead here.
"""

from __future__ import annotations

import random

from wayproblems_spark.rules.catalog import CATALOG
from wayproblems_spark.rules.emitters import Emit
from wayproblems_spark.rules.oracle import way_problems

from .conftest import mk_way
from .test_rules_engine import _HIGHWAYS, _KEYS, _VALUES, run_both


def _dead_sites():
    return {
        i
        for i, e in enumerate(CATALOG)
        if isinstance(e, Emit)
        and e.msg.template == "highway=%s should only be used on nodes"
    }


def _targeted_fixtures():
    """Hand-engineered triggers for sites the random pool misses."""
    fx = [
        {"highway": "primary", "ref": "-"},
        {"highway": "residential", "maxspeed:vehicle": "walk"},
        {"highway": "residential", "maxspeed:motor_vehicle": "walk"},
        {"highway": "residential", "maxspeed:bus": "walk"},
        {"highway": "residential", "maxspeed:hgv": "walk"},
        {"highway": "residential", "maxspeed:forward:hgv": "walk"},
        {"highway": "residential", "maxspeed:forward:vehicle": "walk"},
        {"highway": "residential", "maxspeed:forward:motor_vehicle": "walk"},
        {"highway": "residential", "maxspeed:forward:bus": "walk"},
        {"highway": "residential", "maxspeed:backward:hgv": "walk"},
        {"highway": "residential", "maxspeed:backward:vehicle": "walk"},
        {"highway": "residential", "maxspeed:backward:motor_vehicle": "walk"},
        {"highway": "residential", "maxspeed:backward:bus": "walk"},
        {"highway": "residential", "lanes": "2", "destination:lanes": "A|B|C"},
        {"highway": "residential", "lanes:forward": "2",
         "turn:lanes:forward": "left|right|through", "oneway": "yes"},
        {"highway": "residential", "lanes:forward": "2", "destination:lanes:forward": "A|B|C"},
        {"highway": "residential", "lanes:forward": "1", "turn:lanes:forward": "zz"},
        {"highway": "residential", "lanes:forward": "2", "turn:lanes:forward": "right|left"},
        {"highway": "residential", "lanes:backward": "2",
         "turn:lanes:backward": "left|right|through"},
        {"highway": "residential", "lanes:backward": "2", "destination:lanes:backward": "A|B|C"},
        {"highway": "residential", "lanes:backward": "1", "turn:lanes:backward": "zz"},
        {"highway": "residential", "lanes:backward": "2", "turn:lanes:backward": "right|left"},
        {"highway": "residential", "oneway": "yes", "turn:lanes:backward": "left"},
        {"highway": "residential", "oneway": "yes", "destination:backward": "X"},
        {"highway": "residential", "oneway": "yes", "destination:lanes:backward": "X"},
        {"highway": "residential", "oneway": "-1", "turn:lanes:forward": "left"},
        {"highway": "residential", "oneway": "-1", "destination:forward": "X"},
        {"highway": "residential", "oneway": "-1", "destination:lanes:forward": "X"},
        {"highway": "track", "tracktype": "grade3", "surface": "paved"},
        {"highway": "track", "tracktype": "grade1", "surface": "dirt"},
        {"highway": "residential", "junction": "roundabout", "sidewalk": "left"},
        {"highway": "residential", "junction": "roundabout", "sidewalk": "both"},
        {"highway": "residential", "motor_vehicle": "yes", "motorcar": "yes"},
        {"highway": "residential", "motor_vehicle": "yes", "motorcycle": "yes"},
        {"highway": "residential", "motor_vehicle": "yes", "hgv": "yes"},
        {"highway": "residential", "motor_vehicle": "yes", "motorcar": "no"},
        {"highway": "residential", "motor_vehicle": "yes", "motorcycle": "no"},
        {"highway": "residential", "motor_vehicle": "yes", "hgv": "no"},
        {"highway": "residential", "vehicle": "yes", "motor_vehicle": "no"},
        {"highway": "residential", "vehicle": "yes", "motor_vehicle": "yes"},
        # quirk Q5: key with literal trailing space CAN occur in OSM data
        {"highway": "residential", "cycleway:left ": "foo"},
        {"highway": "residential", "cycleway:left ": "lane"},
    ]
    for key in ("motorcar", "goods", "hgv", "psv", "motor_vehicle",
                "agricultural", "atv", "bus"):
        fx.append({"highway": "path", key: "agricultural"})
        fx.append({"highway": "path", key: "permissive"})
        fx.append({"highway": "path", key: "private"})
    # maxspeed type/source against-type variants
    fx += [
        {"highway": "residential", "maxspeed:type": "DE:zone30", "maxspeed": "30"},
        {"highway": "residential", "maxspeed:type": "DE:zone30", "maxspeed": "50"},
        {"highway": "residential", "maxspeed:type": "DE:zone30"},
        {"highway": "residential", "source:maxspeed": "DE:rural", "maxspeed": "70"},
        {"highway": "residential", "source:maxspeed": "DE:rural"},
    ]
    return fx


def test_targeted_fixtures_match_spark(spark):
    """Spark == oracle on the engineered trigger fixtures (the randomized
    parity hammer lives in test_rules_engine)."""
    rows = [mk_way(i + 1, tags) for i, tags in enumerate(_targeted_fixtures())]
    got, exp = run_both(spark, rows)
    assert got == exp and len(got) > 60


def test_all_live_sites_fire():
    """Coverage property of the catalogue itself, evaluated through the
    oracle (pure Python — Spark-parity of the oracle is proven by the
    parity tests) over targeted fixtures + 200k randomized ways."""
    rng = random.Random(7)
    fired = set()
    for tags in _targeted_fixtures():
        for e in way_problems({"tags": tags, "closed": False}):
            fired.add(e["site"])
    for _ in range(200000):
        tags = {}
        hw = rng.choice(_HIGHWAYS)
        if hw is not None:
            tags["highway"] = hw
        for _ in range(rng.randint(0, 12)):
            tags[rng.choice(_KEYS)] = rng.choice(_VALUES)
        for e in way_problems({"tags": tags, "closed": rng.random() < 0.3}):
            fired.add(e["site"])

    required = set(range(len(CATALOG))) - _dead_sites()
    missing = sorted(required - fired)
    assert not missing, f"sites never fired: {missing}"
