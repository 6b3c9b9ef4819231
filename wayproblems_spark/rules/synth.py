"""Deterministic synthesized way corpus for the production-catalog oracle.

The corpus is a pure closed-form function of ``way_id = l_orderkey*8 +
l_linenumber`` (lineitem), rendered THREE ways from the same spec table:

* :func:`synth_ways_spark` — JVM Column expressions (the engine input for
  the q34 driver row; feeds the REAL ``rules.engine.problems`` catalogue),
* :func:`synth_base_sql` — the DuckDB base CTE used by the generated
  catalogue oracle (``rules.sqlgen``),
* :func:`synth_way_py` — plain Python (coverage property tests).

Mixing function (exact in BIGINT on both engines, no overflow at any SF:
way_id ≤ 4.8e7 at sf1, multiplier ≤ 2.4e6 → product ≤ 1.2e14):

    h(i, j) = (i * (1000003 + 4999*j) + j * 7919) % 2147483647

Per key ``j``: present iff ``h(i, 2j) % m_j == 0``; when present the value
is ``choices_j[h(i, 2j+1) % len(choices_j)]``. Distinct multipliers per
(i, j) decorrelate presence/value across keys (verified by the coverage
test: every live emission site fires at sf0.01's 60k ways).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

H_PRIME = 2147483647
H_BASE = 1000003
H_STEP = 4999
H_ADD = 7919

# (key, presence_modulus, value_choices) — order defines the j index.
# Choice lists are engineered so every live catalogue site fires somewhere
# in a 60k-way corpus (see tests/test_catalog_oracle.py).
SYNTH_KEYS: tuple = (
    ("highway", 1, ("motorway", "motorway_link", "trunk", "trunk_link",
                    "primary", "primary_link", "secondary", "secondary_link",
                    "tertiary", "tertiary_link", "unclassified", "residential",
                    "living_street", "footway", "cycleway", "path", "bridleway",
                    "service", "track", "road", "pedestrian", "steps",
                    "construction", "proposed", "rail", "bus_stop")),
    ("layer", 4, ("0", "5", "11", "-11", "abc", "1.5", "2")),
    ("ref", 4, ("-", "#", "B1", "\t", "L 100")),
    ("maxspeed", 3, ("30", "50", "100", "walk", "none", "signals", "50 mph", "20")),
    ("maxspeed:forward", 4, ("50", "walk", "none")),
    ("maxspeed:backward", 4, ("50", "walk", "signals")),
    ("maxspeed:hgv", 5, ("30", "walk", "none")),
    ("maxspeed:vehicle", 5, ("30", "walk", "none")),
    ("maxspeed:motor_vehicle", 5, ("30", "walk", "none")),
    ("maxspeed:bus", 5, ("30", "walk", "none")),
    ("maxspeed:forward:hgv", 6, ("30", "walk")),
    ("maxspeed:forward:vehicle", 6, ("30", "walk")),
    ("maxspeed:forward:motor_vehicle", 6, ("30", "walk")),
    ("maxspeed:forward:bus", 6, ("30", "walk")),
    ("maxspeed:backward:hgv", 6, ("30", "walk")),
    ("maxspeed:backward:vehicle", 6, ("30", "walk")),
    ("maxspeed:backward:motor_vehicle", 6, ("30", "walk")),
    ("maxspeed:backward:bus", 6, ("30", "walk")),
    ("maxheight", 4, ("default", "none", "1.5", "7.5", "3.5", "abc", "2.0m")),
    ("maxwidth", 4, ("1.5", "7.5", "3.5", "abc")),
    ("lanes", 3, ("1", "2", "3", "0", "9", "abc", "5 ", " 5", "+5", "-1",
                  "99999999999999999999")),
    ("lanes:forward", 4, ("1", "2", "0", "9", "abc")),
    ("lanes:backward", 4, ("1", "2", "0", "9", "abc")),
    ("turn:lanes", 4, ("left|through|right", "right|left", "zz|left", "left|",
                       "|left", "left|;none", "through|through",
                       "sharp_left|sharp_right", "merge_to_right|slight_left")),
    ("turn:lanes:forward", 5, ("left|right", "right|left", "zz", "left")),
    ("turn:lanes:backward", 5, ("left|right", "right|left", "zz", "left")),
    ("destination", 5, ("A", "B")),
    ("destination:lanes", 5, ("A|B|C", "A")),
    ("destination:forward", 6, ("X",)),
    ("destination:backward", 6, ("X",)),
    ("destination:lanes:forward", 6, ("X|Y",)),
    ("destination:lanes:backward", 6, ("X|Y",)),
    ("sidewalk", 3, ("both", "left", "right", "none", "no", "yes", "separate", "foo")),
    ("segregated", 4, ("yes", "no", "foo")),
    ("shoulder", 4, ("both", "left", "no", "yes", "foo")),
    ("oneway", 2, ("yes", "no", "-1", "0", "1", "true", "foo")),
    ("construction", 4, ("yes", "no", "minor", "widening", "residential", "foo", "motorway")),
    ("proposed", 6, ("yes", "primary")),
    ("tracktype", 4, ("grade1", "grade2", "grade3", "foo")),
    ("surface", 3, ("paved", "asphalt", "dirt", "gravel", "concrete")),
    ("tunnel", 4, ("yes", "no", "avalanche_protector", "building_passage", "false", "foo")),
    ("bridge", 4, ("yes", "no", "1", "viaduct")),
    ("junction", 3, ("roundabout", "foo")),
    ("name", 3, ("Main St",)),
    ("footway", 4, ("both", "left", "right", "none", "sidewalk", "crossing", "foo")),
    ("hazmat", 4, ("no", "yes", "destination", "designated", "foo")),
    ("hgv", 4, ("yes", "no", "destination", "designated", "permissive",
                "private", "customers", "agricultural")),
    ("lit", 4, ("no", "yes", "limited", "24/7", "automatic", "foo")),
    ("embankment", 4, ("no", "yes", "1", "0", "true", "false", "foo", "right")),
    ("cutting", 4, ("no", "yes", "1", "0", "true", "false", "left", "right", "foo")),
    ("overtaking", 5, ("no", "yes", "caution", "both", "forward", "backward", "foo")),
    ("overtaking:forward", 5, ("no", "yes", "both", "backward", "foo")),
    ("overtaking:backward", 5, ("no", "yes", "both", "forward", "foo")),
    ("type", 5, ("route", "foo")),
    ("source:maxspeed", 4, ("sign", "DE:urban", "DE:zone30", "DE:rural", "foo")),
    ("maxspeed:source", 8, ("sign",)),
    ("maxspeed:type", 4, ("sign", "DE:zone30", "DE:urban", "foo")),
    ("noexit", 8, ("yes",)),
    ("bicycle", 3, ("yes", "no", "true", "0", "private", "permissive", "customers",
                    "destination", "designated", "use_sidepath", "dismount",
                    "lane", "foo")),
    ("foot", 3, ("yes", "no", "private", "permissive", "customers",
                 "destination", "designated", "use_sidepath", "foo")),
    ("access", 3, ("yes", "no", "true", "private", "permissive", "customers",
                   "destination")),
    ("goods", 5, ("yes", "no", "permissive", "private", "customers", "agricultural")),
    ("motor_vehicle", 3, ("yes", "no", "true", "permissive", "private",
                          "customers", "agricultural", "destination")),
    ("motorcycle", 4, ("yes", "no", "permissive", "private", "customers")),
    ("motorcar", 4, ("yes", "no", "permissive", "private", "customers", "agricultural")),
    ("vehicle", 3, ("yes", "no", "true", "permissive", "private", "customers")),
    ("psv", 4, ("yes", "no", "permissive", "private", "customers", "agricultural")),
    ("mofa", 5, ("yes", "permissive", "private", "customers")),
    ("moped", 5, ("yes", "permissive", "private", "customers")),
    ("horse", 5, ("yes", "no", "permissive", "private", "customers")),
    ("cycleway", 3, ("left", "right", "both", "no", "track", "lane", "shared",
                     "opposite", "opposite_lane", "opposite_track",
                     "opposite_share_busway", "foo")),
    ("cycleway:left", 3, ("track", "lane", "no", "none", "0", "opposite",
                          "sidepath", "foo")),
    ("cycleway:right", 3, ("track", "lane", "no", "none", "0", "opposite",
                           "sidepath", "foo")),
    # Quirk Q5: the key with a literal trailing space (catalog.py:551).
    ("cycleway:left ", 6, ("sidepath", "track", "lane", "foo")),
    ("entrance", 8, ("yes",)),
    ("waterway", 8, ("stream",)),
    ("building", 8, ("yes",)),
    ("service", 4, ("driveway", "alley", "parking_aisle")),
    ("area", 5, ("yes", "no")),
    ("motorroad", 5, ("yes", "no", "1")),
    ("agricultural", 4, ("yes", "no", "permissive", "private", "agricultural")),
    ("atv", 5, ("yes", "no", "permissive", "private", "agricultural")),
    ("bus", 5, ("yes", "no", "permissive", "private", "agricultural")),
)

CLOSED_J = 999          # j index reserved for the closed-ring flag
CLOSED_MOD = 7          # closed iff h(i, CLOSED_J) % 7 == 0


def _h_py(i: int, j: int) -> int:
    return (i * (H_BASE + H_STEP * j) + j * H_ADD) % H_PRIME


def synth_way_py(way_id: int) -> dict:
    """Pure-Python corpus row: {"tags": {...}, "closed": bool}."""
    tags = {}
    for j, (key, mod, choices) in enumerate(SYNTH_KEYS):
        if _h_py(way_id, 2 * j) % mod == 0:
            tags[key] = choices[_h_py(way_id, 2 * j + 1) % len(choices)]
    return {"tags": tags, "closed": _h_py(way_id, CLOSED_J) % CLOSED_MOD == 0}


# ---------------------------------------------------------------------------
# Spark render
# ---------------------------------------------------------------------------


def _h_col(i: Column, j: int) -> Column:
    return (i * F.lit(H_BASE + H_STEP * j).cast("long")
            + F.lit(j * H_ADD).cast("long")) % F.lit(H_PRIME).cast("long")


def synth_ways_spark(lineitem: DataFrame) -> DataFrame:
    """The synthesized ways frame (engine input contract of
    ``rules.engine.problems``), entirely JVM closed-form expressions.

    way_ids are DISTINCT-ed first: the synthetic lineitem fixture carries
    duplicate (l_orderkey, l_linenumber) pairs, and every other column is a
    pure function of way_id."""
    lineitem = lineitem.select(
        (F.col("l_orderkey").cast("long") * 8
         + F.col("l_linenumber").cast("long")).alias("_wid")
    ).distinct()
    i = F.col("_wid")
    entries = []
    for j, (key, mod, choices) in enumerate(SYNTH_KEYS):
        present = _h_col(i, 2 * j) % mod == 0
        idx = (_h_col(i, 2 * j + 1) % len(choices) + 1).cast("int")
        val = F.element_at(F.array(*[F.lit(c) for c in choices]), idx)
        entries.append(
            F.when(present, F.struct(F.lit(key).alias("key"), val.alias("value")))
        )
    tags = F.map_from_entries(F.filter(F.array(*entries), lambda e: e.isNotNull()))
    closed = _h_col(i, CLOSED_J) % CLOSED_MOD == 0
    nodes = F.when(
        closed, F.array(F.lit(1).cast("long"), F.lit(2).cast("long"), F.lit(1).cast("long"))
    ).otherwise(
        F.array(F.lit(1).cast("long"), F.lit(2).cast("long"), F.lit(3).cast("long"))
    )
    return lineitem.select(
        i.alias("way_id"),
        F.lit(1).alias("version"),
        F.lit(100).cast("long").alias("changeset"),
        F.lit(7).cast("long").alias("uid"),
        F.lit("synth").alias("user"),
        F.to_timestamp(F.lit("2020-01-01 00:00:00")).alias("ts"),
        nodes.alias("nodes"),
        tags.alias("tags"),
    )


# ---------------------------------------------------------------------------
# DuckDB render
# ---------------------------------------------------------------------------


def sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _h_sql(j: int) -> str:
    return (f"(i * CAST({H_BASE + H_STEP * j} AS BIGINT) + "
            f"CAST({j * H_ADD} AS BIGINT)) % CAST({H_PRIME} AS BIGINT)")


def tag_col(j: int) -> str:
    return f"t{j}"


def synth_base_sql(table: str = "lineitem") -> str:
    """DuckDB CTE body producing (way_id, closed, t0..tN) — one nullable
    VARCHAR column per SYNTH_KEYS entry, same closed form as the Spark
    and Python renders."""
    cols = []
    for j, (_key, mod, choices) in enumerate(SYNTH_KEYS):
        lst = "[" + ", ".join(sql_quote(c) for c in choices) + "]"
        val = f"({lst})[({_h_sql(2 * j + 1)}) % {len(choices)} + 1]"
        cols.append(
            f"CASE WHEN ({_h_sql(2 * j)}) % {mod} = 0 THEN {val} END AS {tag_col(j)}"
        )
    closed = f"({_h_sql(CLOSED_J)}) % {CLOSED_MOD} = 0 AS closed"
    return (
        "SELECT i AS way_id, " + closed + ", " + ", ".join(cols)
        + f" FROM (SELECT DISTINCT CAST(l_orderkey AS BIGINT)*8 + CAST(l_linenumber AS BIGINT) AS i FROM {table})"
    )


TAG_TO_COL = {key: tag_col(j) for j, (key, _m, _c) in enumerate(SYNTH_KEYS)}
