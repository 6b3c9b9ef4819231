"""Third render target for the rules DSL: DuckDB SQL.

``rules.dsl`` already dual-renders every catalogue expression (Spark Column
+ pure Python). This module adds a mechanical DuckDB renderer so the ENTIRE
production catalogue (every live emission site, wayproblems.cpp:1441-1546)
gets a driver-verified hash-exact oracle: the engine runs the real
``rules.engine.problems`` over the synthesized corpus (``rules.synth``)
while DuckDB recomputes the same rows from this renderer's generated SQL.

Renderer contract (mirrors dsl.py node semantics exactly):

* tag lookup        → nullable VARCHAR column of the synth base CTE
                      (keys never synthesized render as NULL)
* key_value_as_int  → regexp-guarded TRY_CAST with the INT_MAX sentinel
                      (wayproblems.cpp:232-249)
* prefix int/float  → anchored regexp (wayproblems.cpp:219-230, 486)
* predicates        → always COALESCE(..., FALSE) like dsl.py (absent tags
                      behave like C++ nullptr)
* printf messages   → '%s'-split concat with '(null)' for NULL args and the
                      254-char vsnprintf truncation (quirks Q2/Q8)
* turn:lanes emitters → zipped unnest (token, ordinal); the monotonicity
                      fold becomes a lag-window scan with the first
                      zero-priority token as the break horizon
                      (wayproblems.cpp:616-650)
"""

from __future__ import annotations

from . import dsl as D
from .catalog import CATALOG, HIGHWAY_VALID, MapLookup, NeTags
from .emitters import TURN_PRIORITY, VALID_TURNS, Emit, EmitTurnOrder, EmitTurnUnknown
from .synth import TAG_TO_COL, sql_quote, synth_base_sql

_SPLIT_RE = "[|;]+"


class SqlEnv:
    """Maps DSL tag/closed references onto the synth base CTE's columns."""

    def tag(self, key: str) -> str:
        col = TAG_TO_COL.get(key)
        return col if col is not None else "CAST(NULL AS VARCHAR)"

    @property
    def closed(self) -> str:
        return "closed"


def _in_list(expr: str, values) -> str:
    return f"{expr} IN ({', '.join(sql_quote(v) for v in values)})"


def _intof_sql(env: SqlEnv, key: str) -> str:
    v = env.tag(key)
    return (
        f"CASE WHEN regexp_matches({v}, {sql_quote(D.STRICT_INT_RE)}) "
        f"AND TRY_CAST({v} AS BIGINT) BETWEEN {D.INT32_MIN} AND {D.INT32_MAX} "
        f"THEN TRY_CAST({v} AS BIGINT) ELSE CAST({D.INT_SENTINEL} AS BIGINT) END"
    )


def render_value(x, env: SqlEnv) -> str:
    """SQL for a value expression (nullable VARCHAR/BIGINT)."""
    if isinstance(x, D.Tag):
        return env.tag(x.key)
    if isinstance(x, D.Lit):
        return sql_quote(x.value) if isinstance(x.value, str) else str(x.value)
    if isinstance(x, D.IntOf):
        return _intof_sql(env, x.key)
    if isinstance(x, D.IntStr):
        return f"CAST({_intof_sql(env, x.key)} AS VARCHAR)"
    if isinstance(x, MapLookup):
        v = env.tag(x.key)
        whens = " ".join(
            f"WHEN {sql_quote(k)} THEN {sql_quote(out)}" for k, out in x.mapping
        )
        return f"(CASE {v} {whens} END)"
    raise TypeError(f"no SQL render for value node {type(x).__name__}")


def render_pred(p, env: SqlEnv) -> str:
    """SQL for a predicate (non-NULL boolean, like dsl.py col())."""
    if isinstance(p, D.Has):
        return f"({env.tag(p.key)} IS NOT NULL)"
    if isinstance(p, D.Eq):
        return f"COALESCE({env.tag(p.key)} = {sql_quote(p.value)}, FALSE)"
    if isinstance(p, D.InL):
        return f"COALESCE({_in_list(env.tag(p.key), p.values)}, FALSE)"
    if isinstance(p, D.IsStrictInt):
        v = env.tag(p.key)
        return (
            f"COALESCE(regexp_matches({v}, {sql_quote(D.STRICT_INT_RE)}) "
            f"AND TRY_CAST({v} AS BIGINT) BETWEEN {D.INT32_MIN} AND {D.INT32_MAX}, FALSE)"
        )
    if isinstance(p, D.IsPrefixInt):
        return f"COALESCE(regexp_matches({env.tag(p.key)}, {sql_quote(D.PREFIX_INT_RE)}), FALSE)"
    if isinstance(p, D.IsPrefixFloat):
        return f"COALESCE(regexp_matches({env.tag(p.key)}, {sql_quote(D.PREFIX_FLOAT_RE)}), FALSE)"
    if isinstance(p, D.FloatCmp):
        v = env.tag(p.key)
        num = (
            f"TRY_CAST(regexp_extract({v}, {sql_quote(D.PREFIX_FLOAT_RE)}, 0) AS DOUBLE)"
        )
        op = "<" if p.op == "lt" else ">"
        return f"COALESCE({num} {op} {p.bound!r}, FALSE)"
    if isinstance(p, D.IntCmp):
        op = {"eq": "=", "le": "<=", "gt": ">", "lt": "<"}[p.op]
        return f"COALESCE({_intof_sql(env, p.key)} {op} CAST({p.bound} AS BIGINT), FALSE)"
    if isinstance(p, D.LanesSumMismatch):
        return (
            f"({_intof_sql(env, 'lanes')} != "
            f"({_intof_sql(env, 'lanes:forward')} + {_intof_sql(env, 'lanes:backward')}))"
        )
    if isinstance(p, D.PipeCountMismatch):
        v = env.tag(p.lanekey)
        pipes = f"(length({v}) - length(replace({v}, '|', '')))"
        return f"COALESCE({_intof_sql(env, p.key)} != ({pipes} + 1), FALSE)"
    if isinstance(p, D.Closed):
        return env.closed
    if isinstance(p, D.Not):
        return f"(NOT {render_pred(p.a, env)})"
    if isinstance(p, D.And):
        return "(" + " AND ".join(render_pred(t, env) for t in p.terms) + ")"
    if isinstance(p, D.Or):
        return "(" + " OR ".join(render_pred(t, env) for t in p.terms) + ")"
    if isinstance(p, D.LitP):
        return "TRUE" if p.value else "FALSE"
    if isinstance(p, NeTags):
        a, b = render_value(p.a, env), render_value(p.b, env)
        return f"COALESCE({a} <> {b}, FALSE)"
    raise TypeError(f"no SQL render for predicate node {type(p).__name__}")


def render_msg(msg: D.Msg, env: SqlEnv) -> str:
    """printf template → '||' concat with (null)/254-truncation parity."""
    parts = msg.template.split("%s")
    assert len(parts) == len(msg.args) + 1, msg.template
    pieces = []
    for i, part in enumerate(parts):
        if part:
            pieces.append(sql_quote(part))
        if i < len(msg.args):
            a = render_value(msg.args[i], env)
            pieces.append(f"COALESCE(CAST({a} AS VARCHAR), {sql_quote(D.NULL_STR)})")
    body = " || ".join(pieces) if pieces else "''"
    return f"substr({body}, 1, {D.TRUNC})"


def _emit_select(e: Emit, site: int, env: SqlEnv) -> str:
    return (
        f"SELECT way_id, {site} AS site, 0 AS sub, "
        f"{sql_quote(e.layer)} AS layer, {sql_quote(e.style)} AS style, "
        f"{render_msg(e.msg, env)} AS problem FROM g WHERE {render_pred(e.cond, env)}"
    )


def _turn_base(key: str, env: SqlEnv, one_based: bool) -> str:
    """Zipped (token, ordinal) unnest of turn:<key> under the emitter guard."""
    turn = env.tag("turn:" + key)
    guard = f"{env.tag(key)} IS NOT NULL AND {turn} IS NOT NULL"
    lo, hi = ("1", "len(toks)+1") if one_based else ("0", "len(toks)")
    return (
        f"SELECT way_id, v, unnest(toks) AS tok, unnest(range({lo}, {hi})) AS i "
        f"FROM (SELECT way_id, v, string_split_regex(v, {sql_quote(_SPLIT_RE)}) AS toks "
        f"FROM (SELECT way_id, {turn} AS v FROM g WHERE {guard}))"
    )


def _turn_unknown_select(e: EmitTurnUnknown, site: int, env: SqlEnv) -> str:
    tmpl_pre = sql_quote(f"{e.key}=")
    mid = sql_quote(" contains lane turn ")
    tail = sql_quote(" which is unknown")
    valid = ", ".join(sql_quote(t) for t in VALID_TURNS)
    return (
        f"SELECT way_id, {site} AS site, CAST(i AS INT) AS sub, "
        f"'wayproblems' AS layer, 'default' AS style, "
        f"substr({tmpl_pre} || v || {mid} || tok || {tail}, 1, {D.TRUNC}) AS problem "
        f"FROM ({_turn_base(e.key, env, one_based=False)}) "
        f"WHERE tok NOT IN ({valid})"
    )


def _turn_order_select(e: EmitTurnOrder, site: int, env: SqlEnv) -> str:
    """The C++ monotonicity fold as a lag-window scan: the emission is the
    FIRST adjacent priority increase strictly before the first
    zero-priority (unknown/empty) token (wayproblems.cpp:632-650)."""
    prio = " ".join(
        f"WHEN {sql_quote(t)} THEN {p}" for t, p in TURN_PRIORITY.items()
    )
    tmpl_pre = sql_quote(f"turn:{e.key} has turn ...")
    return (
        f"SELECT way_id, {site} AS site, 0 AS sub, "
        f"'wayproblems' AS layer, 'default' AS style, "
        f"substr({tmpl_pre} || arg_min(ptok, i) || '|' || arg_min(tok, i) || '...', 1, {D.TRUNC}) AS problem "
        f"FROM ("
        f"SELECT way_id, i, tok, p, lag(tok) OVER w AS ptok, lag(p) OVER w AS pp, "
        f"min(CASE WHEN p = 0 THEN i END) OVER (PARTITION BY way_id) AS zi "
        f"FROM (SELECT way_id, tok, i, CASE tok {prio} ELSE 0 END AS p "
        f"FROM ({_turn_base(e.key, env, one_based=True)})) "
        f"WINDOW w AS (PARTITION BY way_id ORDER BY i)"
        f") WHERE i >= 2 AND p > pp AND (zi IS NULL OR i < zi) "
        f"GROUP BY way_id"
    )


def catalog_oracle_sql(table: str = "lineitem") -> str:
    """The full generated oracle: every catalogue emission site as a UNION
    ALL branch over the synthesized corpus, gated like engine.gate."""
    env = SqlEnv()
    branches = []
    for site, emitter in enumerate(CATALOG):
        if isinstance(emitter, Emit):
            branches.append(_emit_select(emitter, site, env))
        elif isinstance(emitter, EmitTurnUnknown):
            branches.append(_turn_unknown_select(emitter, site, env))
        elif isinstance(emitter, EmitTurnOrder):
            branches.append(_turn_order_select(emitter, site, env))
        else:  # pragma: no cover - catalogue invariant
            raise TypeError(f"unknown emitter {type(emitter).__name__}")
    gate = _in_list(env.tag("highway"), HIGHWAY_VALID)
    union = "\nUNION ALL\n".join(branches)
    return (
        f"WITH base AS ({synth_base_sql(table)}),\n"
        f"g AS (SELECT * FROM base WHERE {gate})\n"
        f"SELECT way_id, CAST(site AS BIGINT) AS site, CAST(sub AS BIGINT) AS sub, "
        f"layer, style, problem FROM (\n{union}\n)"
    )
