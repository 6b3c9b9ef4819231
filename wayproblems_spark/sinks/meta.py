"""P10 — presentation metadata (wayproblems-meta.sql:6-114 equivalent).

Static key→value dict written once beside the output; consumed by a viewer.
"""

from __future__ import annotations

import json

STYLES = {
    "default": {"color": "#ff0000", "weight": "4", "opacity": "0.9"},
    "ref": {"color": "#000080", "weight": "3", "opacity": "0.9"},
    "footway": {"color": "#707000", "weight": "3", "opacity": "0.9"},
    "redundant": {"color": "#007070", "weight": "3", "opacity": "0.6"},
    "redline": {"color": "#ff0000", "weight": "4", "opacity": "0.9"},
    "steelline": {"color": "#374e66", "weight": "4", "opacity": "0.9"},
    "brownline": {"color": "#CD853F", "weight": "4", "opacity": "0.9"},
    "violetline": {"color": "#9932CC", "weight": "4", "opacity": "0.9"},
}

LAYERS = ("wayproblems", "ref", "footway", "strange", "cycling", "defaults")

# layers that get presentation meta in the reference
# (wayproblems-meta.sql:43-114 — note `cycling` has a table but no meta
# section there; we mirror that by giving it columns but no popup)
META_LAYERS = ("wayproblems", "ref", "footway", "strange", "defaults")

LAYER_COLUMNS = (
    "id", "key", "value", "changeset", "user", "timestamp", "problem", "style",
)

# layer.*.popup HTML (wayproblems-meta.sql readfile('wayproblems-meta.popup');
# the mustache template feeds spatialite-rest's popup rendering)
POPUP_HTML = (
    "<h4>Way problems:</h4>\n"
    'Way <a href="https://www.openstreetmap.org/way/{{ id }}">{{ id }}</a><br>\n'
    "Last modified {{ timestamp }}<br>\n"
    "in changeset {{ changeset }} by {{ user }}<br>\n"
    '<p style="font-size: 1.2em;">{{ problem }}</p>\n'
    "{{> remotecontrol wayselect=id }}\n"
)


def meta_dict() -> dict[str, str]:
    meta: dict[str, str] = {}
    for style, attrs in STYLES.items():
        for k, v in attrs.items():
            meta[f"style.{style}.{k}"] = v
    for layer in META_LAYERS:
        meta[f"layer.{layer}.geometrycolumn"] = "geometry"
        meta[f"layer.{layer}.srid"] = "4326"
        meta[f"layer.{layer}.stylecolumn"] = "style"
        for i, col in enumerate(LAYER_COLUMNS):
            meta[f"layer.{layer}.columns:{i}"] = col
        meta[f"layer.{layer}.popup"] = POPUP_HTML
    return meta


def write_meta(path: str) -> None:
    with open(path, "w") as f:
        json.dump(meta_dict(), f, indent=1, sort_keys=True)
