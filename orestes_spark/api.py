"""Request/response API layer with the reference's HTTP contract.

The reference exposes POST /write /read /series /select_distinct
/delete (/root/reference/lib/orestes.js:66-230). This module speaks the
same request/response *shapes* as plain dicts — an HTTP framework (none
ships in this container) would only add routing around
``handle_request``:

    write           → {"errors": [{point, error}, ...]}
    read            → {"series": [{"tags": {...}, "points": [[ms, v], ...]}]}
    read + count    → {"series": [{"tags": {...}, "count": N}]}
    /series         → {"series": [tags, ...]}
    /select_distinct→ bare array of combo objects
    /delete         → {"ok": true, "dropped_buckets": [...]}
    errors          → {"code", "message"} with an HTTP-ish status

Defaults mirror the reference: space 'default', query match_all,
start 0, end now (/root/reference/lib/orestes.js:20-22, 83-86); only
the ``count`` aggregation is accepted, anything else is a 400
(/root/reference/lib/orestes.js:143-150).
"""

from __future__ import annotations

import time as _time
from typing import Any

from orestes_spark.engine import OrestesEngine
from orestes_spark.esdsl import UnsupportedDslError


class ApiError(Exception):
    def __init__(self, status: int, message: str) -> None:
        super().__init__(message)
        self.status = status
        self.message = message


def _read_params(body: dict) -> tuple[dict | None, int, int]:
    query = body.get("query") or {"match_all": {}}
    start = int(body.get("start", 0))
    end = int(body.get("end", _time.time() * 1000))
    return query, start, end


def handle_request(engine: OrestesEngine, endpoint: str, body: dict | list, space: str = "default") -> Any:
    """Dispatch one reference-shaped request. Raises ApiError(status,
    message) for contract violations."""
    try:
        if endpoint == "write":
            if not isinstance(body, list):
                raise ApiError(400, "write body must be an array of points")
            return {"errors": engine.write(body, space)}

        if endpoint == "read":
            query, start, end = _read_params(body)
            aggregations = body.get("aggregations")
            if aggregations:
                if any(a.get("type") != "count" for a in aggregations):
                    # only count is supported
                    # (/root/reference/lib/orestes.js:143-150)
                    raise ApiError(400, "unsupported aggregation type")
                rows = engine.count_points(query, space, start, end).collect()
                return {"series": [{"tags": dict(r["tags"]), "count": r["count"]} for r in rows]}
            rows = engine.read(query, space, start, end, grouped=True).collect()
            return {
                "series": [
                    {
                        "tags": dict(r["tags"]),
                        "points": [[p["time_ms"], p["value"]] for p in r["points"]],
                    }
                    for r in rows
                ]
            }

        if endpoint == "series":
            query, start, end = _read_params(body)
            rows = engine.get_stream_list(query, space, start, end).collect()
            return {"series": [dict(r["tags"]) for r in rows]}

        if endpoint == "select_distinct":
            keys = body.get("keys")
            if not keys:
                raise ApiError(400, "select_distinct requires keys")
            query = body.get("query") or {"match_all": {}}
            rows = engine.select_distinct(keys, query, space).collect()
            return [r.asDict() for r in rows]

        if endpoint == "delete":
            if "keep_days" not in body:
                raise ApiError(400, "delete requires keep_days")
            dropped = engine.remove(body.get("space", space), int(body["keep_days"]))
            return {"ok": True, "dropped_buckets": dropped}

        raise ApiError(404, f"unknown endpoint {endpoint!r}")
    except UnsupportedDslError as e:
        raise ApiError(400, str(e)) from e
