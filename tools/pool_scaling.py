#!/usr/bin/env python
"""Reproduce the BASELINE.md steady-state-min scaling table from the raw
per-JVM files in BENCH/.

    python tools/pool_scaling.py r5d r5e r5c:8
    python tools/pool_scaling.py r5d r5e r5c:8 r6a --drop minhash_dedup

Args are run tags; `tag:LEVEL` restricts a tag to one level (e.g. the
aborted r5c contributes only its valid local[8] JVM). Pools every
`BENCH/scaling_raw_<tag>_<level>_<i>.json`, asserts fingerprints are
identical across ALL pooled JVMs, takes the per-leg minimum at each
level, and prints eff = (t_N / t_4N) / 4 per leg.

Only pool tags whose leg code AND leg input are identical — a leg that
changed between tags must be excluded with `--drop leg[,leg...]` (r6
re-sized the minhash leg's corpus 8×, so cross-round pools drop
`minhash_dedup` and that leg pools from r6 tags alone). As a guard, any
leg whose run-to-run count key differs across the pooled JVMs is skipped
with a warning instead of reporting a meaningless ratio.
"""

from __future__ import annotations

import glob
import json
import os
import sys

BENCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")


# leg → its output-count key in the raw file's `counts` (the per-leg
# change guard; legs without a row here have no single count key)
LEG_COUNT_KEY = {
    "wayproblems_e2e": "flagged",
    "extract_text": "extract_ok",
    "tile_pyramid": "tiles",
    "knn_assign": "knn",
    "pip_contains": "pip",
    "minhash_dedup": "minhash_pairs",
    "ann_ivf_build": "ann_assigned",
    "ann_ivf_topk": "ann_topk",
}


def main(argv: list[str]) -> int:
    drop: set[str] = set()
    specs: list[str] = []
    it = iter(argv or ["r5d", "r5e", "r5c:8"])
    for a in it:
        if a == "--drop":
            drop.update(next(it).split(","))
        else:
            specs.append(a)
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
    # compare fingerprints on the keys every pooled JVM carries (a tag
    # that ADDS a leg adds a fingerprint key; shared legs must agree)
    all_fps = [r.get("fingerprints") or {} for rs in runs.values() for r in rs]
    shared = set.intersection(*(set(f) for f in all_fps))
    assert shared, "no shared fingerprint keys across pooled JVMs"
    fps = {json.dumps({k: f[k] for k in sorted(shared)}) for f in all_fps}
    assert len(fps) == 1, f"fingerprints differ across pooled JVMs: {fps}"
    legs = sorted(set.intersection(*(set(r["queries"]) for rs in runs.values() for r in rs)))
    print(f"pool: {len(runs[lo])}x local[{lo}] + {len(runs[hi])}x local[{hi}] JVMs, fingerprints identical")
    print(f"{'leg':22s} {'local['+str(lo)+'] min':>14s} {'local['+str(hi)+'] min':>14s}  eff")
    for leg in legs:
        if leg in drop:
            print(f"{leg:22s} {'(dropped)':>14s}")
            continue
        ck = LEG_COUNT_KEY.get(leg)
        if ck is not None:
            cs = {r["counts"].get(ck) for rs in runs.values() for r in rs}
            if len(cs) > 1:
                print(f"{leg:22s} {'(skipped)':>14s}  count {ck} differs across pooled JVMs: {sorted(cs)} — leg changed between tags, pool it per-tag")
                continue
        t_lo = min(r["queries"][leg] for r in runs[lo])
        t_hi = min(r["queries"][leg] for r in runs[hi])
        print(f"{leg:22s} {t_lo:14.3f} {t_hi:14.3f}  {round((t_lo / t_hi) / (hi // lo), 3)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
