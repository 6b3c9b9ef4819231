"""P7 deliverable — SQLite export of the 6-layer problems database.

The reference writes a SpatiaLite DB via GDAL (wayproblems.cpp:62-90:
six LineString layers, each with the 9 all-string fields) that
spatialite-rest serves directly; the meta table comes from
wayproblems-meta.sql. This sink produces the same consumable from the
engine's layer-features output: per-layer tables with the identical
column set, geometry carried as WKT, plus the populated ``meta`` table
(styles, layer columns, popup HTML — sinks.meta.meta_dict).

Geometry note: GDAL's SPATIALITE=TRUE stores ISO-WKB blobs plus the
spatial metadata tables; libspatialite is not available in this
environment, so geometry is exported as the equivalent WKT text column
(`GeomFromText(geometry, 4326)` converts it inside any spatialite-enabled
consumer — the conversion SQL ships in the DB as meta key
``export.geometry.load``).

A SQLite file is an inherently single-writer artifact, so the export is a
driver-side stream (sorted ``toLocalIterator`` — executors never hold the
file). At cluster scale the parquet layers stay the analytical store and
this export is the final small fan-in, exactly like the reference's
single-process write.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .meta import LAYERS, meta_dict

FIELDS = (
    "id", "key", "value", "changeset", "user", "timestamp",
    "problem", "version", "style",
)

LOAD_GEOMETRY_SQL = (
    "UPDATE {table} SET GEOMETRY = GeomFromText(geometry_wkt, 4326)"
)


def export_sqlite(features: DataFrame, db_path: str, batch: int = 2000) -> dict[str, int]:
    """features = sinks.writer.layer_features output (9 fields + geometry
    WKT + layer). Returns per-layer row counts."""
    con = sqlite3.connect(db_path)
    cur = con.cursor()
    cur.execute("PRAGMA synchronous = OFF")
    for layer in LAYERS:
        cur.execute(f'DROP TABLE IF EXISTS "{layer}"')
        cols = ", ".join(f'"{f}" TEXT' for f in FIELDS)
        cur.execute(
            f'CREATE TABLE "{layer}" (ogc_fid INTEGER PRIMARY KEY, {cols}, '
            f"geometry_wkt TEXT)"
        )
    cur.execute("DROP TABLE IF EXISTS meta")
    cur.execute("CREATE TABLE meta ( key varchar, value varchar )")
    meta = dict(meta_dict())
    meta["export.geometry.load"] = LOAD_GEOMETRY_SQL
    cur.executemany("INSERT INTO meta VALUES (?, ?)", sorted(meta.items()))

    counts = {layer: 0 for layer in LAYERS}
    ins = {
        layer: (
            f'INSERT INTO "{layer}" ({", ".join(chr(34)+f+chr(34) for f in FIELDS)}, '
            f"geometry_wkt) VALUES ({', '.join('?' * (len(FIELDS) + 1))})"
        )
        for layer in LAYERS
    }
    # deterministic emission order mirrors the reference's per-way append:
    # id is a string-cast way_id, so sort its NUMERIC value ("9" < "10",
    # round-2 ADVICE — lexicographic order diverged from the reference)
    it = (
        features.select(*FIELDS, "geometry", "layer", "site", "sub")
        .orderBy(F.col("id").cast("long"), "site", "sub")
        .toLocalIterator()
    )
    buf: dict[str, list] = {layer: [] for layer in LAYERS}

    def flush(layer):
        if buf[layer]:
            cur.executemany(ins[layer], buf[layer])
            counts[layer] += len(buf[layer])
            buf[layer].clear()

    for row in it:
        layer = row["layer"]
        buf[layer].append(tuple(row[f] for f in FIELDS) + (row["geometry"],))
        if len(buf[layer]) >= batch:
            flush(layer)
    for layer in LAYERS:
        flush(layer)
    con.commit()
    con.close()
    return counts
