"""Deterministic Common-Crawl-style `pages` corpus generator.

Shape mandated by BASELINE.json ``input_hint``:
``pages(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Each page's ``text`` carries zero or more embedded geo records (FIXTURES.md §1
micro-format) plus seeded filler prose; ``html`` is a deterministic wrapper
with entity escaping. The extractor must recover ``text`` byte-identically
per url (the BASELINE row invariant) — escaping makes that a real inverse
transform, not a substring copy.

No external data; everything derives from the seed (north_rule).
"""

from __future__ import annotations

import datetime
import random

BASE_TS = datetime.datetime(2026, 1, 1, 0, 0, 0)

_WORDS = (
    "the quick survey of municipal road data shows that mapping quality "
    "varies widely across regions and that consistent tagging of lanes "
    "speed limits and access restrictions remains an open problem for "
    "volunteer communities worldwide while automated validation engines "
    "can flag suspicious combinations early and reduce review burden"
).split()

_LANGS = ("en", "de", "fr")

# Tag pools engineered so the generated corpus fires a wide spread of the
# rule catalogue (positives) while containing plenty of clean ways.
_HIGHWAYS = (
    "residential", "primary", "secondary", "tertiary", "unclassified",
    "living_street", "track", "service", "footway", "cycleway", "path",
    "motorway", "trunk", "road", "pedestrian", "steps", "construction",
    "bridleway", "bus_stop", "proposed",
)
_TAG_CHOICES = (
    ("lanes", ("1", "2", "3", "0", "9", "abc", "2 ")),
    ("turn:lanes", ("left|right", "left|through|right", "right|left", "zz|left", "left|;none")),
    ("maxspeed", ("30", "50", "100", "walk", "50 mph", "none", "signals")),
    ("maxspeed:backward", ("30", "60")),
    ("maxheight", ("1.5", "3.5m", "8", "default", "xx")),
    ("maxwidth", ("1.2", "2.5", "9.9", "broad")),
    ("layer", ("0", "1", "-1", "12", "-12", "x", "+2")),
    ("ref", ("B64", "L778", "-", "#")),
    ("oneway", ("yes", "no", "-1", "0", "true")),
    ("sidewalk", ("both", "left", "right", "no", "separate", "weird")),
    ("segregated", ("yes", "no", "maybe")),
    ("shoulder", ("yes", "no", "wide")),
    ("construction", ("yes", "no", "minor", "primary", "odd")),
    ("proposed", ("yes",)),
    ("tracktype", ("grade1", "grade3", "grade9")),
    ("surface", ("paved", "asphalt", "dirt", "gravel")),
    ("tunnel", ("yes", "no", "building_passage")),
    ("bridge", ("yes", "no")),
    ("junction", ("roundabout",)),
    ("name", ("Hauptstrasse", "Feldweg")),
    ("footway", ("sidewalk", "crossing", "left", "odd")),
    ("hazmat", ("yes", "no", "designated", "odd")),
    ("lit", ("yes", "no", "24/7", "dim")),
    ("embankment", ("yes", "no", "two_sided")),
    ("cutting", ("yes", "no", "left", "deep")),
    ("overtaking", ("yes", "no", "caution", "odd")),
    ("overtaking:forward", ("both", "backward", "yes")),
    ("type", ("route", "multipolygon")),
    ("source:maxspeed", ("DE:urban", "DE:zone30", "survey", "sign")),
    ("maxspeed:type", ("DE:rural", "DE:zone:30", "guess")),
    ("maxspeed:source", ("sign",)),
    ("noexit", ("yes",)),
    ("bicycle", ("yes", "no", "permissive", "private", "destination", "use_sidepath", "odd")),
    ("foot", ("yes", "no", "permissive", "private", "destination", "odd")),
    ("access", ("yes", "private", "permissive", "customers", "no")),
    ("vehicle", ("yes", "no", "private")),
    ("motor_vehicle", ("yes", "no", "permissive")),
    ("motorcycle", ("yes", "no")),
    ("motorcar", ("yes", "no")),
    ("hgv", ("yes", "no")),
    ("psv", ("yes", "no", "customers")),
    ("goods", ("yes",)),
    ("mofa", ("private",)),
    ("horse", ("customers",)),
    ("cycleway", ("lane", "track", "opposite", "left", "right", "both", "shared", "no")),
    ("cycleway:left", ("lane", "track", "no", "foo")),
    ("cycleway:right", ("lane", "track", "no", "foo")),
    ("entrance", ("yes",)),
    ("waterway", ("stream",)),
    ("building", ("yes",)),
    ("service", ("driveway", "alley")),
    ("area", ("yes",)),
    ("motorroad", ("yes",)),
    ("agricultural", ("yes", "no")),
    ("destination", ("Bielefeld",)),
    ("destination:lanes", ("A|B", "A|B|C")),
)

# Germany-ish bounding box (FIXTURES.md §3).
LAT0, LAT1 = 51.0, 52.5
LON0, LON1 = 8.0, 9.5


def _iso(ts: datetime.datetime) -> str:
    return ts.strftime("%Y-%m-%dT%H:%M:%SZ")


def _escape(t: str) -> str:
    return t.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def html_wrap(url: str, text: str) -> bytes:
    """Deterministic HTML wrapper; inverse implemented in sources.extract."""
    return (
        '<!DOCTYPE html><html><head><meta charset="utf-8"><title>'
        + _escape(url)
        + '</title></head><body><nav>home | map | about</nav><article id="main">'
        + _escape(text)
        + "</article><footer>&copy; fixture</footer></body></html>"
    ).encode("utf-8")


def generate_corpus(
    n_pages: int = 400,
    seed: int = 42,
    split: str = "unit",
    ways_per_page: float = 0.6,
    nodes_per_page: float = 3.0,
    polys_total: int = 8,
) -> dict:
    """Deterministic corpus: pages + the ground-truth records embedded in them.

    Returns dict with keys: pages, ways, nodes, polys (plain python lists of
    tuples, schemas in fixtures/__init__ docstring / FIXTURES.md).
    """
    rng = random.Random((seed, split, n_pages).__repr__())
    n_nodes = max(8, int(n_pages * nodes_per_page))
    n_ways = max(4, int(n_pages * ways_per_page))

    nodes = []
    for nid in range(1, n_nodes + 1):
        lat = round(LAT0 + rng.random() * (LAT1 - LAT0), 6)
        lon = round(LON0 + rng.random() * (LON1 - LON0), 6)
        nodes.append((nid, lat, lon))

    ways = []
    for wid in range(1, n_ways + 1):
        nrefs = rng.randint(2, 6)
        refs = [rng.randint(1, n_nodes) for _ in range(nrefs)]
        if rng.random() < 0.15:
            refs.append(refs[0])  # closed ring
        if rng.random() < 0.05:
            refs[rng.randrange(len(refs))] = n_nodes + 1000 + wid  # dangling ref
        tags = {}
        hw = rng.choice(_HIGHWAYS)
        if rng.random() < 0.97:
            tags["highway"] = hw
        for _ in range(rng.randint(0, 6)):
            k, vals = _TAG_CHOICES[rng.randrange(len(_TAG_CHOICES))]
            tags[k] = vals[rng.randrange(len(vals))]
        ts = BASE_TS + datetime.timedelta(seconds=wid)
        ways.append(
            (
                wid,
                rng.randint(1, 9),
                10_000 + wid,
                100 + (wid % 50),
                f"mapper{wid % 23}",
                ts,
                refs,
                tags,
            )
        )

    polys = []
    for pid in range(1, polys_total + 1):
        cx = LON0 + rng.random() * (LON1 - LON0)
        cy = LAT0 + rng.random() * (LAT1 - LAT0)
        r = 0.05 + rng.random() * 0.4
        k = rng.randint(4, 8)
        ring = []
        for j in range(k):
            ang = 2 * 3.141592653589793 * j / k
            import math

            ring.append(
                (
                    round(cx + r * math.cos(ang), 6),
                    round(cy + 0.7 * r * math.sin(ang), 6),
                )
            )
        ring.append(ring[0])
        polys.append((pid, "admin" if pid % 2 else "landuse", ring))

    # Distribute records across pages.
    page_lines: list[list[str]] = [[] for _ in range(n_pages)]
    for nid, lat, lon in nodes:
        page_lines[rng.randrange(n_pages)].append(
            f"OSMNODE id={nid} lat={lat:.6f} lon={lon:.6f}"
        )
    for wid, ver, cs, uid, user, ts, refs, tags in ways:
        # TAB-separated pairs: values may contain spaces/pipes/semicolons,
        # never tab/newline/'=' (generator invariant, parsed by str_to_map).
        tagstr = "\t".join(f"{k}={v}" for k, v in tags.items())
        page_lines[rng.randrange(n_pages)].append(
            f"OSMWAY id={wid} version={ver} changeset={cs} uid={uid} "
            f"user={user} ts={_iso(ts)} nodes={','.join(map(str, refs))} "
            f"tags={tagstr}"
        )
    for pid, kind, ring in polys:
        ringstr = ",".join(f"{x:.6f} {y:.6f}" for x, y in ring)
        page_lines[rng.randrange(n_pages)].append(
            f"OSMPOLY id={pid} kind={kind} ring={ringstr}"
        )

    pages = []
    for i in range(n_pages):
        url = f"https://fixture.example/{split}/{i:08d}"
        ts = BASE_TS + datetime.timedelta(seconds=i)
        prose = " ".join(
            rng.choice(_WORDS) for _ in range(rng.randint(8, 40))
        )
        # sprinkle characters the HTML escaping must round-trip
        if rng.random() < 0.3:
            prose += " <tags & brackets> are fun"
        body_lines = page_lines[i] + [prose]
        rng.shuffle(body_lines)
        text = "\n".join(body_lines)
        pages.append((url, ts, html_wrap(url, text), text, _LANGS[i % 3]))

    return {"pages": pages, "ways": ways, "nodes": nodes, "polys": polys}


def pages_df(spark, corpus_or_pages):
    from pyspark.sql import types as T

    pages = (
        corpus_or_pages["pages"]
        if isinstance(corpus_or_pages, dict)
        else corpus_or_pages
    )
    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("html", T.BinaryType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
        ]
    )
    return spark.createDataFrame(pages, schema)
