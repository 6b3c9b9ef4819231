"""Pure-Python oracle: evaluates the SAME catalogue objects the Spark
engine compiles, row-at-a-time — the reference semantics transcription used
by property-based tests and golden generation (SURVEY.md §5.2.2).
"""

from __future__ import annotations

from .catalog import CATALOG, HIGHWAY_VALID


def way_problems(way: dict) -> list[dict]:
    """way: {'tags': dict[str,str], 'closed': bool}. Returns emission dicts
    (site, sub, layer, style, problem) in reference dispatch order."""
    tags = way.get("tags") or {}
    if tags.get("highway") not in HIGHWAY_VALID:
        return []
    w = {"tags": tags, "closed": bool(way.get("closed", False))}
    out: list[dict] = []
    for site, emitter in enumerate(CATALOG):
        out.extend(emitter.eval_py(site, w))
    return out
