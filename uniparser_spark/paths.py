"""Minimal JSONPath and ObjectPath evaluators.

The reference delegates to jsonpath-rw-ext and objectpath
(/root/reference/uniparser/parsers.py:474-545); neither library is
available here, so these evaluators implement exactly the query subset
its test corpus exercises (/root/reference/test_parsers.py:407-470 and
config.py demo rules):

JSONPath: bare fields, ``$.a.b``, recursive ``$..k`` and ``$..*``,
``[n]``, ``[a:b]`` slices, ``[*]``, field unions ``['a','b']``, index
unions ``[0,2]``, filters ``[?(@.k op literal)]``.
Results are lists of matches carrying ``value`` and ``full_path``.

ObjectPath: ``$.a.b``, recursive ``$..k``, ``[n]``, unions, filters
``[@.k op literal]`` with ops ``> < >= <= == = is not_is !=``.
Plain paths return a scalar; recursive/filter/union steps return lists.

Anything beyond the subset — bare-word unions ``[a,b]``, script
expressions ``[(...)]``, nested filters, functions — raises
:class:`UnsupportedPathError` with the offending construct named, so a
rule author sees "unsupported path syntax" as the error value instead
of a silently-empty result.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any, List, NamedTuple, Optional, Tuple


class UnsupportedPathError(ValueError):
    """Path uses syntax outside the implemented JSONPath/ObjectPath
    subset (unions, script expressions, functions, ...)."""


class PathRepr:
    """Opaque path handle; repr mimics jsonpath-rw's AST display for the
    shapes the corpus checks (test_parsers.py:440-442)."""

    __slots__ = ("_repr",)

    def __init__(self, r: str):
        self._repr = r

    def __repr__(self) -> str:
        return self._repr


class JPMatch(NamedTuple):
    value: Any
    full_path: PathRepr


_STEP = re.compile(
    r"""
    \.\.(?P<rfield>[^.\[]+)
  | \.(?P<field>[^.\[]+)
  | \[\?\((?P<jfilter>[^)]*)\)\]
  | \[(?P<ofilter>@[^\]]*)\]
  | \[(?P<funion>(?:'[^']*'|"[^"]*")(?:\s*,\s*(?:'[^']*'|"[^"]*"))+)\]
  | \['(?P<qfield>[^']*)'\]
  | \["(?P<qqfield>[^"]*)"\]
  | \[(?P<bracket>[^\]]*)\]
    """,
    re.VERBOSE,
)

_QUOTED = re.compile(r"""'([^']*)'|"([^"]*)\"""")

_FILTER = re.compile(
    r"""\s*@\.(?P<key>[\w.-]+)\s*(?P<op>==|=|!=|>=|<=|>|<|\bis\s+not\b|\bis\b|\bnot\s+in\b|\bin\b)\s*(?P<lit>.+?)\s*$""",
    re.VERBOSE,
)


def _parse_literal(lit: str) -> Any:
    lit = lit.strip()
    if lit and lit[0] in "\"'" and lit[-1] == lit[0]:
        return lit[1:-1]
    if lit == "true":
        return True
    if lit == "false":
        return False
    if lit == "null":
        return None
    try:
        return int(lit)
    except ValueError:
        return float(lit)


_OPS = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "is": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
}


def _filter_pred(expr: str):
    m = _FILTER.match(expr)
    if not m:
        raise UnsupportedPathError(f"unsupported filter expression: {expr!r}")
    key, op, lit = m.group("key"), re.sub(r"\s+", " ", m.group("op")), _parse_literal(m.group("lit"))
    fn = _OPS.get(op)
    if fn is None:
        raise UnsupportedPathError(f"unsupported filter op: {op!r}")

    def pred(item: Any) -> bool:
        if not isinstance(item, dict):
            return False
        if key in item:  # a literal dotted key wins over traversal
            val = item[key]
        elif "." in key:  # @.a.b nested filter key
            val = item
            for part in key.split("."):
                if not isinstance(val, dict) or part not in val:
                    return False
                val = val[part]
        else:
            return False
        try:
            return bool(fn(val, lit))
        except TypeError:
            return False

    return pred


class Step(NamedTuple):
    kind: str  # field | rfield | index | slice | wild | filter
    arg: Any


@lru_cache(maxsize=4096)
def _compile(path: str) -> Tuple[Tuple[Step, ...], bool]:
    """Returns (steps, rooted). Accepts '$.a', '$..k', 'a.b', '[n]' forms."""
    rooted = False
    s = path.strip()
    if s.startswith("$"):
        rooted = True
        s = s[1:]
    if s and not s.startswith((".", "[")):
        s = "." + s
    steps: List[Step] = []
    pos = 0
    while pos < len(s):
        m = _STEP.match(s, pos)
        if not m:
            raise UnsupportedPathError(
                f"unsupported path syntax in {path!r} at offset {pos}: {s[pos:pos+20]!r}"
            )
        pos = m.end()
        if m.group("rfield") is not None:
            f = m.group("rfield")
            steps.append(Step("rwild", None) if f == "*" else Step("rfield", f))
        elif m.group("field") is not None:
            f = m.group("field")
            steps.append(Step("wild", None) if f == "*" else Step("field", f))
        elif m.group("jfilter") is not None:
            steps.append(Step("filter", _filter_pred(m.group("jfilter"))))
        elif m.group("ofilter") is not None:
            steps.append(Step("filter", _filter_pred(m.group("ofilter"))))
        elif m.group("funion") is not None:
            names = tuple(
                q.group(1) if q.group(1) is not None else q.group(2)
                for q in _QUOTED.finditer(m.group("funion"))
            )
            steps.append(Step("fields", names))
        elif m.group("qfield") is not None:
            steps.append(Step("field", m.group("qfield")))
        elif m.group("qqfield") is not None:
            steps.append(Step("field", m.group("qqfield")))
        else:
            b = m.group("bracket").strip()
            if b == "*":
                steps.append(Step("wild", None))
            elif ":" in b:
                try:
                    parts = [p.strip() for p in b.split(":")]
                    ints = [int(p) if p else None for p in parts] + [None, None]
                except ValueError as err:
                    raise UnsupportedPathError(
                        f"unsupported path syntax: slice {b!r} in {path!r}"
                    ) from err
                steps.append(Step("slice", slice(ints[0], ints[1], ints[2])))
            elif "," in b:
                try:
                    steps.append(Step("indexes", tuple(int(p) for p in b.split(","))))
                except ValueError as err:
                    # mixed unions '[0,'a']', scripts, functions, ...
                    raise UnsupportedPathError(
                        f"unsupported path syntax: bracket step {b!r} in {path!r}"
                    ) from err
            else:
                try:
                    steps.append(Step("index", int(b)))
                except ValueError as err:
                    # scripts '[(...)]', functions, bare-word unions, ...
                    raise UnsupportedPathError(
                        f"unsupported path syntax: bracket step {b!r} in {path!r}"
                    ) from err
    return tuple(steps), rooted


def _descend(obj: Any, key: str, acc: List[Any]) -> None:
    if isinstance(obj, dict):
        for k, v in obj.items():
            if k == key:
                acc.append(v)
            _descend(v, key, acc)
    elif isinstance(obj, list):
        for v in obj:
            _descend(v, key, acc)


def _descend_all(obj: Any, acc: List[Any]) -> None:
    """``$..*``: every descendant value, DFS pre-order, root excluded."""
    children = (
        list(obj.values()) if isinstance(obj, dict)
        else list(obj) if isinstance(obj, (list, tuple))
        else ()
    )
    for v in children:
        acc.append(v)
        _descend_all(v, acc)


def _apply_step(values: List[Any], step: Step) -> List[Any]:
    out: List[Any] = []
    for v in values:
        if step.kind == "field":
            if isinstance(v, dict) and step.arg in v:
                out.append(v[step.arg])
        elif step.kind == "rfield":
            _descend(v, step.arg, out)
        elif step.kind == "rwild":
            _descend_all(v, out)
        elif step.kind == "fields":
            if isinstance(v, dict):
                out.extend(v[k] for k in step.arg if k in v)
        elif step.kind == "indexes":
            if isinstance(v, (list, tuple)):
                for i in step.arg:
                    try:
                        out.append(v[i])
                    except IndexError:
                        pass
        elif step.kind == "index":
            if isinstance(v, (list, tuple)):
                try:
                    out.append(v[step.arg])
                except IndexError:
                    pass
        elif step.kind == "slice":
            if isinstance(v, (list, tuple)):
                out.extend(v[step.arg])
        elif step.kind == "wild":
            if isinstance(v, dict):
                out.extend(v.values())
            elif isinstance(v, (list, tuple)):
                out.extend(v)
        elif step.kind == "filter":
            if isinstance(v, (list, tuple)):
                out.extend(item for item in v if step.arg(item))
            elif step.arg(v):
                out.append(v)
    return out


# ---------------------------------------------------------------- JSONPath


def jsonpath_find(data: Any, path: str) -> List[JPMatch]:
    steps, rooted = _compile(path)
    values = [data]
    for step in steps:
        values = _apply_step(values, step)
    # full_path repr: bare single-field paths display as jsonpath-rw Fields
    if not rooted and len(steps) == 1 and steps[0].kind == "field":
        pr = PathRepr(f"Fields({steps[0].arg!r})")
    else:
        pr = PathRepr(path)
    return [JPMatch(v, pr) for v in values]


def jsonpath_values(data: Any, path: str, attr: str = "value") -> List[Any]:
    matches = jsonpath_find(data, path)
    return [getattr(m, attr, m.value) for m in matches]


# --------------------------------------------------------------- ObjectPath


def objectpath_execute(data: Any, path: str) -> Any:
    steps, _ = _compile(path)
    multi = any(
        s.kind in ("rfield", "rwild", "filter", "wild", "slice", "fields", "indexes")
        for s in steps
    )
    values = [data]
    for step in steps:
        values = _apply_step(values, step)
    if multi:
        return values
    return values[0] if values else None
