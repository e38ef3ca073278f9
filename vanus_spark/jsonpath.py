"""JSONPath addressing over the JSON payload column.

The reference parses the payload with ojg and addresses it by JSONPath
(reference: pkg/json.go:26-46 — 0 matches => error, 1 => scalar,
many => list) and can set/delete paths, creating intermediate maps
(reference: server/trigger/util/event.go:160-256 SetData).

Two sides:
- Column side: ``get_json_col(data_col, "$.a.b")`` emits
  ``get_json_object`` — stays in the JVM; Catalyst prunes to only the
  referenced paths (mirrors the reference's lazy parse,
  server/trigger/filter/common.go:87-96).
- Python side: get/set/delete over parsed dicts for the pipeline
  interpreter (supports dot paths, [n] indices, [*]/[:] wildcards).
"""

from __future__ import annotations

import functools
import re
from typing import Any

from pyspark.sql import Column, functions as F


class JSONPathError(ValueError):
    pass


class JSONPathNotExist(JSONPathError):
    pass


_TOKEN_RE = re.compile(r"\.?([^.\[\]]+)|\[([^\]]*)\]")


@functools.lru_cache(maxsize=4096)
def parse_path(path: str) -> list[Any]:
    """'$.a.b[0][*].c' -> ['a', 'b', 0, '*', 'c'].

    Accepts leading '$' or '$.'; '@.x' is the caller's shorthand and
    must be rewritten to '$.data.x' before reaching here
    (reference: pkg/transform/arg/arg.go:60-62).

    Memoized ("parse once, evaluate per event" — the reference parses
    specs at build time, trigger.go:106-136; the interpreter hot loop
    re-resolves per event, so the cache is what restores that
    property). Callers must treat the returned list as immutable.
    """
    p = path.strip()
    if p.startswith("$"):
        p = p[1:]
    tokens: list[Any] = []
    for m in _TOKEN_RE.finditer(p):
        if m.group(1) is not None:
            tokens.append(m.group(1))
        else:
            idx = m.group(2).strip().strip("'\"")
            if idx in ("*", ":", ""):
                tokens.append("*")
            else:
                try:
                    tokens.append(int(idx))
                except ValueError:
                    tokens.append(idx)  # ['key'] bracket form
    return tokens


def _get_tokens(node: Any, tokens: list[Any]) -> list[Any]:
    if not tokens:
        return [node]
    head, rest = tokens[0], tokens[1:]
    if head == "*":
        out: list[Any] = []
        if isinstance(node, list):
            for item in node:
                out.extend(_get_tokens(item, rest))
        elif isinstance(node, dict):
            for item in node.values():
                out.extend(_get_tokens(item, rest))
        return out
    if isinstance(head, int):
        if isinstance(node, list) and -len(node) <= head < len(node):
            return _get_tokens(node[head], rest)
        return []
    if isinstance(node, dict) and head in node:
        return _get_tokens(node[head], rest)
    return []


def py_get(data: Any, path: str) -> Any:
    """0 matches => JSONPathNotExist; 1 => the value; many => list
    (reference: pkg/json.go:30-46)."""
    res = _get_tokens(data, parse_path(path))
    if not res:
        raise JSONPathNotExist(path)
    if len(res) == 1:
        return res[0]
    return res


def py_exists(data: Any, path: str) -> bool:
    return bool(_get_tokens(data, parse_path(path)))


def py_set(data: Any, path: str, value: Any) -> Any:
    """Set, creating intermediate dicts as needed
    (reference: server/trigger/util/event.go:160-256). Returns the
    (possibly new) root."""
    tokens = parse_path(path)
    if not tokens:
        return value
    if data is None or not isinstance(data, (dict, list)):
        data = {}
    node = data
    for i, tok in enumerate(tokens[:-1]):
        nxt = tokens[i + 1]
        if isinstance(tok, int):
            if not isinstance(node, list) or not (-len(node) <= tok < len(node)):
                raise JSONPathError(f"cannot set through index {tok} in {path}")
            if not isinstance(node[tok], (dict, list)):
                node[tok] = {} if not isinstance(nxt, int) else []
            node = node[tok]
        else:
            if not isinstance(node, dict):
                raise JSONPathError(f"cannot set key {tok} on non-object in {path}")
            if tok not in node or not isinstance(node[tok], (dict, list)):
                node[tok] = {} if not isinstance(nxt, int) else []
            node = node[tok]
    last = tokens[-1]
    if isinstance(last, int):
        if not isinstance(node, list) or not (-len(node) <= last < len(node)):
            raise JSONPathError(f"cannot set index {last} in {path}")
        node[last] = value
    else:
        if not isinstance(node, dict):
            raise JSONPathError(f"cannot set key {last} on non-object in {path}")
        node[last] = value
    return data


def py_delete(data: Any, path: str) -> None:
    tokens = parse_path(path)
    if not tokens:
        raise JSONPathError("cannot delete root")
    node = data
    for tok in tokens[:-1]:
        if isinstance(tok, int):
            if not isinstance(node, list) or not (-len(node) <= tok < len(node)):
                raise JSONPathNotExist(path)
            node = node[tok]
        else:
            if not isinstance(node, dict) or tok not in node:
                raise JSONPathNotExist(path)
            node = node[tok]
    last = tokens[-1]
    if isinstance(last, int):
        if isinstance(node, list) and -len(node) <= last < len(node):
            del node[last]
            return
    elif isinstance(node, dict) and last in node:
        del node[last]
        return
    raise JSONPathNotExist(path)


# ---------------------------------------------------------------------------
# Column side
# ---------------------------------------------------------------------------

def get_json_col(data_col: Column | str, path: str) -> Column:
    """JSONPath get as a JVM expression. ``get_json_object`` handles
    $.a.b, [n] and [*]; multi-match returns a JSON array string which
    matches the reference's list-stringification for filter compares."""
    c = F.col(data_col) if isinstance(data_col, str) else data_col
    norm = path if path.startswith("$") else "$." + path
    return F.get_json_object(c, norm)
