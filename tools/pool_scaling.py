#!/usr/bin/env python
"""Reproduce the BASELINE.md steady-state-min scaling table from the raw
per-JVM files in BENCH/.

    python tools/pool_scaling.py r5d r5e r5c:8

Args are run tags; `tag:LEVEL` restricts a tag to one level (e.g. the
aborted r5c contributes only its valid local[8] JVM). Pools every
`BENCH/scaling_raw_<tag>_<level>_<i>.json`, asserts fingerprints are
identical across ALL pooled JVMs, takes the per-leg minimum at each
level, and prints eff = (t_N / t_4N) / 4 per leg.

Only pool tags whose leg code is identical — a leg whose operator changed
between tags must be restricted (or dropped) exactly as BASELINE.md's
prose states for the minhash leg.
"""

from __future__ import annotations

import glob
import json
import os
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


def main(argv: list[str]) -> int:
    specs = argv or ["r5d", "r5e", "r5c:8"]
    runs: dict[int, list[dict]] = {}
    for spec in specs:
        tag, _, only = spec.partition(":")
        for path in sorted(glob.glob(os.path.join(BENCH, f"scaling_raw_{tag}_*_*.json"))):
            level = int(os.path.basename(path).split("_")[3])
            if only and level != int(only):
                continue
            runs.setdefault(level, []).append(json.load(open(path)))
    if len(runs) != 2:
        print(f"need exactly 2 levels, got {sorted(runs)}", file=sys.stderr)
        return 1
    lo, hi = sorted(runs)
    fps = {json.dumps(r.get("fingerprints"), sort_keys=True) for rs in runs.values() for r in rs}
    assert len(fps) == 1, f"fingerprints differ across pooled JVMs: {fps}"
    legs = sorted(set.intersection(*(set(r["queries"]) for rs in runs.values() for r in rs)))
    print(f"pool: {len(runs[lo])}x local[{lo}] + {len(runs[hi])}x local[{hi}] JVMs, fingerprints identical")
    print(f"{'leg':22s} {'local['+str(lo)+'] min':>14s} {'local['+str(hi)+'] min':>14s}  eff")
    for leg in legs:
        t_lo = min(r["queries"][leg] for r in runs[lo])
        t_hi = min(r["queries"][leg] for r in runs[hi])
        print(f"{leg:22s} {t_lo:14.3f} {t_hi:14.3f}  {round((t_lo / t_hi) / (hi // lo), 3)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
