"""Elasticsearch query-DSL subset → Spark Column predicate (F1).

The reference accepts an arbitrary ES filter in the ``query`` body key
(default ``{match_all: {}}``) and pushes it into the metadata search
(/root/reference/lib/orestes.js:20-22,84;
 /root/reference/lib/orestes-query.js:184-197). The subset implemented
here — match_all, term, terms, range, bool (must/should/must_not/filter),
exists, missing, prefix, wildcard, regexp, ids, not/and/or (ES-1.x style),
filtered, constant_score — covers everything the reference's tests and
README exercise, and then some. Unsupported node types raise loudly
(UnsupportedDslError) rather than silently matching nothing.

Translation targets a *resolver*: a function key → Column. The default
resolver reads ``tags['key']`` on the canonical MAP column; a flat-column
resolver serves wide tables (one column per tag). Everything produced is
a built-in Column expression, so Catalyst can push the predicate to the
parquet scan.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

Resolver = Callable[[str], Column]


class UnsupportedDslError(ValueError):
    pass


def tags_map_resolver(tags_col: str = "tags") -> Resolver:
    return lambda key: F.col(tags_col).getItem(key)


def flat_resolver(available: list[str] | None = None) -> Resolver:
    """Resolve keys to top-level columns, cast to string (tag semantics:
    every tag value compares as a string, like the reference's ES docs).
    Keys not in ``available`` resolve to NULL (ES missing-field behavior)."""

    def resolve(key: str) -> Column:
        if available is not None and key not in available:
            return F.lit(None).cast("string")
        return F.col(key).cast("string")

    return resolve


def _wildcard_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append("\\" + ch if ch in ".^$+{}[]|()\\" else ch)
    return "^" + "".join(out) + "$"


def _term_value(v: Any) -> Column:
    if isinstance(v, bool):
        return F.lit("true" if v else "false")
    return F.lit(str(v))


def _single_kv(node: dict, kind: str) -> tuple[str, Any]:
    if not isinstance(node, dict) or len(node) != 1:
        raise UnsupportedDslError(f"{kind} clause must have exactly one field: {node!r}")
    return next(iter(node.items()))


def _combine(cols: list[Column], op: str) -> Column:
    acc = cols[0]
    for c in cols[1:]:
        acc = (acc & c) if op == "and" else (acc | c)
    return acc


def _as_list(x: Any) -> list:
    return x if isinstance(x, list) else [x]


def translate(query: Any, resolve: Resolver | None = None) -> Column:
    """ES query/filter JSON → boolean Column. ``None`` ⇒ match_all."""
    resolve = resolve or tags_map_resolver()
    if query is None or query == {}:
        return F.lit(True)
    if not isinstance(query, dict):
        raise UnsupportedDslError(f"query must be an object, got {type(query).__name__}")
    if len(query) != 1:
        # ES treats multiple top-level filter keys as an implicit AND.
        return _combine([translate({k: v}, resolve) for k, v in query.items()], "and")

    kind, body = next(iter(query.items()))

    if kind == "match_all":
        return F.lit(True)
    if kind in ("filtered", "constant_score"):
        # {filtered: {filter: F, query: Q}} — reference wraps every request
        # this way (/root/reference/lib/orestes-query.js:187-193).
        parts = [translate(body[k], resolve) for k in ("filter", "query") if isinstance(body, dict) and k in body]
        if not parts:
            raise UnsupportedDslError(f"{kind} without filter/query: {body!r}")
        return _combine(parts, "and")
    if kind in ("term", "match", "match_phrase"):
        k, v = _single_kv(body, kind)
        if isinstance(v, dict):  # {term: {field: {value: v}}}
            v = v.get("value", v.get("query"))
        return resolve(k) == _term_value(v)
    if kind == "terms":
        k, v = _single_kv(body, kind)
        return resolve(k).isin([str(x) for x in _as_list(v)])
    if kind == "range":
        k, spec = _single_kv(body, kind)
        if not isinstance(spec, dict) or not spec:
            raise UnsupportedDslError(f"range spec must be a non-empty object: {spec!r}")
        col = resolve(k)
        parts = []
        for op, bound in spec.items():
            b = _term_value(bound)
            if op == "gt":
                parts.append(col > b)
            elif op in ("gte", "from"):
                parts.append(col >= b)
            elif op == "lt":
                parts.append(col < b)
            elif op in ("lte", "to"):
                parts.append(col <= b)
            else:
                raise UnsupportedDslError(f"unsupported range op {op!r}")
        return _combine(parts, "and")
    if kind == "exists":
        field = body["field"] if isinstance(body, dict) and "field" in body else _single_kv(body, kind)[1]
        return resolve(field).isNotNull()
    if kind == "missing":
        field = body["field"] if isinstance(body, dict) and "field" in body else _single_kv(body, kind)[1]
        return resolve(field).isNull()
    if kind == "prefix":
        k, v = _single_kv(body, kind)
        if isinstance(v, dict):
            v = v.get("value", v.get("prefix"))
        return resolve(k).startswith(str(v))
    if kind == "wildcard":
        k, v = _single_kv(body, kind)
        if isinstance(v, dict):
            v = v.get("value", v.get("wildcard"))
        return resolve(k).rlike(_wildcard_to_regex(str(v)))
    if kind == "regexp":
        k, v = _single_kv(body, kind)
        if isinstance(v, dict):
            v = v.get("value")
        return resolve(k).rlike("^(" + str(v) + ")$")
    if kind == "ids":
        # series_id is the doc _id (attr string) in the reference.
        values = body.get("values", []) if isinstance(body, dict) else _as_list(body)
        return F.col("series_id").isin([str(x) for x in values])
    if kind == "bool":
        if not isinstance(body, dict):
            raise UnsupportedDslError(f"bool body must be an object: {body!r}")
        parts: list[Column] = []
        for clause in ("must", "filter"):
            if clause in body:
                parts.append(_combine([translate(q, resolve) for q in _as_list(body[clause])], "and"))
        if "should" in body:
            shoulds = [translate(q, resolve) for q in _as_list(body["should"])]
            if shoulds:
                parts.append(_combine(shoulds, "or"))
        if "must_not" in body:
            nots = [translate(q, resolve) for q in _as_list(body["must_not"])]
            # ES must_not is a filter-context NOT: null never matches the
            # inner clause, so NOT(null-match) should keep the row.
            parts.append(~_combine(nots, "or") | _combine(nots, "or").isNull())
        if not parts:
            return F.lit(True)
        return _combine(parts, "and")
    if kind == "not":
        inner = translate(body.get("filter", body) if isinstance(body, dict) and "filter" in body else body, resolve)
        return ~inner | inner.isNull()
    if kind in ("and", "or"):
        clauses = body["filters"] if isinstance(body, dict) and "filters" in body else _as_list(body)
        return _combine([translate(q, resolve) for q in clauses], kind)

    raise UnsupportedDslError(f"unsupported ES DSL node: {kind!r}")
