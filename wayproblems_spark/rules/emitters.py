"""Emission-site objects: each compiles to Catalyst expressions and
evaluates in pure Python (the oracle path).

An emitter contributes elements of type
``struct<site:int, sub:int, layer:string, style:string, problem:string>``
to the per-way multi-emit array (SURVEY.md §2.1 P6). ``site`` is the global
dispatch-order index (wayproblems.cpp:1448-1518 call order, loops unrolled);
``sub`` orders multi-token emissions within a site.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dsl import NULL_STR, TRUNC, Env, Has, Msg, P

EMIT_DDL = "struct<site:int,sub:int,layer:string,style:string,problem:string>"

# turn:lanes token vocabulary (wayproblems.cpp:622-623) — includes "".
VALID_TURNS = (
    "left", "right", "slight_left", "slight_right", "through",
    "merge_to_left", "merge_to_right", "reverse", "none",
    "sharp_left", "sharp_right", "",
)

# wayproblems.cpp:147-159 — unknown commands map to 0 (scan break).
TURN_PRIORITY = {
    "sharp_right": 1,
    "right": 2,
    "slight_right": 3,
    "merge_to_left": 4,
    "through": 5,
    "none": 5,
    "merge_to_right": 6,
    "slight_left": 7,
    "left": 8,
    "sharp_left": 9,
    "reverse": 10,
}

_token_split = re.compile(r"[|;]+")


def _null_emit() -> Column:
    return F.lit(None).cast(EMIT_DDL)


def _mk(site: int, sub, layer: str, style: str, problem: Column) -> Column:
    sub_col = sub if isinstance(sub, Column) else F.lit(sub)
    return F.struct(
        F.lit(site).alias("site"),
        sub_col.cast("int").alias("sub"),
        F.lit(layer).alias("layer"),
        F.lit(style).alias("style"),
        problem.alias("problem"),
    )


@dataclass(frozen=True)
class Emit:
    """Standard single emission: when(cond) → (layer, style, message)."""

    cond: P
    layer: str
    style: str
    msg: Msg

    def spark_items(self, env: Env, site: int) -> list[Column]:
        return [F.when(self.cond.col(env), _mk(site, 0, self.layer, self.style, self.msg.col(env)))]

    def eval_py(self, site: int, way: dict) -> list[dict]:
        if self.cond.py(way):
            return [
                {
                    "site": site,
                    "sub": 0,
                    "layer": self.layer,
                    "style": self.style,
                    "problem": self.msg.py(way),
                }
            ]
        return []


@dataclass(frozen=True)
class EmitTurnUnknown:
    """One emission per unknown turn token in turn:<key>
    (wayproblems.cpp:616-630). Layer L_WP, style default."""

    key: str  # 'lanes' | 'lanes:forward' | 'lanes:backward'

    def _guard(self) -> P:
        return Has(self.key) & Has("turn:" + self.key)

    def spark_arrays(self, env: Env, site: int) -> list[Column]:
        turnkey = "turn:" + self.key
        t = env.tags.getItem(turnkey)
        toks = F.split(t, r"[|;]+")
        tmpl = f"{self.key}=%s contains lane turn %s which is unknown"
        items = F.transform(
            toks,
            lambda x, i: F.when(
                ~x.isin(*VALID_TURNS),
                _mk(
                    site,
                    i,
                    "wayproblems",
                    "default",
                    F.substring(
                        F.format_string(tmpl, F.coalesce(t, F.lit(NULL_STR)), x), 1, TRUNC
                    ),
                ),
            ),
        )
        return [F.when(self._guard().col(env), items).otherwise(F.array(_null_emit()))]

    def eval_py(self, site: int, way: dict) -> list[dict]:
        if not self._guard().py(way):
            return []
        v = way["tags"]["turn:" + self.key]
        out = []
        for i, tok in enumerate(_token_split.split(v)):
            if tok not in VALID_TURNS:
                p = f"{self.key}={v} contains lane turn {tok} which is unknown"[:TRUNC]
                out.append(
                    {"site": site, "sub": i, "layer": "wayproblems",
                     "style": "default", "problem": p}
                )
        return out


@dataclass(frozen=True)
class EmitTurnOrder:
    """Left-to-right turn-command monotonicity scan (wayproblems.cpp:632-650).

    Fold over tokens: unknown/empty token (priority 0) breaks the scan;
    a priority increase after a named token emits once and breaks.
    Implemented JVM-side with ``F.aggregate`` — no Python in the hot path.
    """

    key: str

    def _guard(self) -> P:
        return Has(self.key) & Has("turn:" + self.key)

    def spark_arrays(self, env: Env, site: int) -> list[Column]:
        turnkey = "turn:" + self.key
        t = env.tags.getItem(turnkey)
        toks = F.split(t, r"[|;]+")
        prio = F.create_map(
            *[F.lit(x) for kv in TURN_PRIORITY.items() for x in kv]
        )

        def mkacc(prev, pname, stop, a, b):
            return F.struct(
                prev.alias("prev"), pname.alias("pname"), stop.alias("stop"),
                a.alias("a"), b.alias("b"),
            )

        acc0 = mkacc(
            F.lit(99999), F.lit(""), F.lit(False),
            F.lit(None).cast("string"), F.lit(None).cast("string"),
        )

        def step(acc, x):
            p = F.coalesce(F.element_at(prio, x), F.lit(0))
            keep = mkacc(acc["prev"], acc["pname"], acc["stop"], acc["a"], acc["b"])
            stopped = mkacc(acc["prev"], acc["pname"], F.lit(True), acc["a"], acc["b"])
            bad = mkacc(acc["prev"], acc["pname"], F.lit(True), acc["pname"], x)
            adv = mkacc(p, x, F.lit(False), acc["a"], acc["b"])
            return (
                F.when(acc["stop"], keep)
                .when(p == 0, stopped)
                .when((p > acc["prev"]) & (acc["pname"] != ""), bad)
                .otherwise(adv)
            )

        res = F.aggregate(toks, acc0, step)
        tmpl = f"turn:{self.key} has turn ...%s|%s..."
        emit = F.when(
            res["a"].isNotNull(),
            _mk(
                site, 0, "wayproblems", "default",
                F.substring(F.format_string(tmpl, res["a"], res["b"]), 1, TRUNC),
            ),
        )
        return [
            F.when(self._guard().col(env), F.array(emit)).otherwise(
                F.array(_null_emit())
            )
        ]

    def eval_py(self, site: int, way: dict) -> list[dict]:
        if not self._guard().py(way):
            return []
        v = way["tags"]["turn:" + self.key]
        prev, pname = 99999, ""
        for tok in _token_split.split(v):
            p = TURN_PRIORITY.get(tok, 0)
            if not p:
                break
            if p > prev and pname != "":
                problem = f"turn:{self.key} has turn ...{pname}|{tok}..."[:TRUNC]
                return [
                    {"site": site, "sub": 0, "layer": "wayproblems",
                     "style": "default", "problem": problem}
                ]
            prev, pname = p, tok
        return []
