"""GeoJSON polygon-layer source → the engine's G4 polygon frame.

Admin/landuse boundary layers ship as GeoJSON FeatureCollections (the
reference's polygon inputs are the same class of data, delivered to it
as OGR layers). This reader produces the exact frame shape
`point_in_polygon` / `polygon_intersect_join` / `zonal_stats` consume:

    (poly_id long, kind string,
     ring  array<struct<lon:double,lat:double>>,
     holes array<array<struct<lon:double,lat:double>>>)

Physical shape: polygon layers are the SMALL side of every join in this
engine (10^2..10^5 features), so each file is read whole
(`spark.read.text(wholetext=True)` — file-parallel across a directory
of layer files) and parsed inside one `mapInPandas` pass; no per-row
Python ever touches the big point/page side. Spark's native JSON reader
is deliberately not used: Polygon vs MultiPolygon coordinates differ in
nesting depth (3 vs 4), which breaks uniform schema inference, while an
explicit per-feature parse handles both and keeps provenance.

Determinism + the unique-id contract: `poly_id` is the feature's
numeric `id` (top-level or in properties) when present, else a stable
61-bit value derived from the md5 of the feature's canonical JSON —
re-reading the same layer yields identical ids regardless of
partitioning. MultiPolygon features emit one row per part in a
DISJOINT id range: `poly_id = 2^62 | base << 12 | part` (parts capped
at 4096, base must fit 50 bits — md5 fallbacks are masked to fit,
numeric ids past 2^50 raise), while plain-Polygon ids stay < 2^62
(numeric ids ≥ 2^62 raise). The two ranges can never collide, so the
ray-cast aggregate's unique-poly_id contract holds for any mix of
features without a global registry.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame

POLY_DDL = (
    "poly_id long, kind string, "
    "ring array<struct<lon:double,lat:double>>, "
    "holes array<array<struct<lon:double,lat:double>>>"
)

_MAX_PARTS = 4096          # 12 bits of part index
_MULTI_FLAG = 1 << 62      # MultiPolygon rows live in [2^62, 2^63)
_MULTI_BASE_BITS = 50      # flag(1) + base(50) + part(12) = 63 bits
_PLAIN_MAX = _MULTI_FLAG   # plain-Polygon ids stay below the flag


def _feature_id(feat: dict, multi: bool) -> int:
    fid = feat.get("id")
    if fid is None:
        fid = (feat.get("properties") or {}).get("id")
    if isinstance(fid, bool):
        fid = None
    explicit = None
    if isinstance(fid, (int, float)) and float(fid).is_integer():
        explicit = int(fid)
    elif isinstance(fid, str):
        try:
            explicit = int(fid)
        except ValueError:
            pass
    if explicit is not None:
        limit = 1 << _MULTI_BASE_BITS if multi else _PLAIN_MAX
        if not 0 <= explicit < limit:
            raise ValueError(
                f"GeoJSON feature id {explicit} outside the packable range "
                f"[0, 2^{limit.bit_length() - 1}) for "
                f"{'MultiPolygon' if multi else 'Polygon'} features"
            )
        return explicit
    canon = json.dumps(feat, sort_keys=True, separators=(",", ":"))
    digest = hashlib.md5(canon.encode("utf-8")).digest()
    h = int.from_bytes(digest[:8], "big")
    # masked to the range that keeps the packed id inside int64 and the
    # plain/multi ranges disjoint
    return h >> (64 - _MULTI_BASE_BITS) if multi else h >> 3  # 50 / 61 bits


def _ring_rows(ring):
    return [{"lon": float(p[0]), "lat": float(p[1])} for p in ring]


def _feature_rows(feat: dict, kind_property: str):
    geom = feat.get("geometry") or {}
    gtype = geom.get("type")
    props = feat.get("properties") or {}
    kind = props.get(kind_property)
    kind = str(kind) if kind is not None else (gtype or "unknown")
    if gtype == "Polygon":
        parts = [geom.get("coordinates") or []]
    elif gtype == "MultiPolygon":
        parts = geom.get("coordinates") or []
    else:  # points/lines/null geometries are not polygon-layer rows
        return
    if len(parts) > _MAX_PARTS:
        raise ValueError(
            f"MultiPolygon with {len(parts)} parts exceeds the "
            f"{_MAX_PARTS}-part poly_id packing"
        )
    multi = gtype == "MultiPolygon"
    base = _feature_id(feat, multi)
    for part_idx, rings in enumerate(parts):
        if not rings:
            continue
        yield {
            "poly_id": (
                _MULTI_FLAG | (base << 12) | part_idx if multi else base
            ),
            "kind": kind,
            "ring": _ring_rows(rings[0]),
            "holes": [_ring_rows(h) for h in rings[1:]],
        }


def read_geojson_polygons(
    spark, path: str, kind_property: str = "kind"
) -> DataFrame:
    """Read one file or a directory of `.geojson`/`.json` layer files
    into the engine's polygon frame. `kind_property` names the property
    copied into `kind` (falls back to the geometry type). Non-polygonal
    features are skipped."""
    import pandas as pd

    raw = spark.read.text(path, wholetext=True)

    def gen(batches):
        for pdf in batches:
            out = []
            for doc in pdf["value"]:
                data = json.loads(doc)
                root = data.get("type")
                if root == "FeatureCollection":
                    feats = data.get("features", [])
                elif root == "Feature":
                    feats = [data]
                elif root in ("Polygon", "MultiPolygon"):
                    # bare-Geometry document — wrap so it parses (and
                    # hashes) like any other feature
                    feats = [
                        {"type": "Feature", "geometry": data, "properties": {}}
                    ]
                else:
                    feats = []
                for feat in feats:
                    out.extend(_feature_rows(feat, kind_property))
            yield pd.DataFrame(
                out, columns=["poly_id", "kind", "ring", "holes"]
            )

    return raw.mapInPandas(gen, POLY_DDL)
