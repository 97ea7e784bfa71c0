"""Minimal JSONPath and ObjectPath evaluators.

The reference delegates to jsonpath-rw-ext and objectpath
(/root/reference/uniparser/parsers.py:474-545); neither library is
available here, so these evaluators implement exactly the query subset
its test corpus exercises (/root/reference/test_parsers.py:407-470 and
config.py demo rules):

JSONPath: bare fields, ``$.a.b``, recursive ``$..k`` and ``$..*``,
``[n]``, ``[a:b]`` slices, ``[*]``, field unions ``['a','b']``, index
unions ``[0,2]``, filters ``[?(...)]``.
Results are lists of matches carrying ``value`` and ``full_path``.

ObjectPath: ``$.a.b``, recursive ``$..k``, ``[n]``, unions, filters
``[@.k op literal]``.
Plain paths return a scalar; recursive/filter/union steps return lists.

Filter predicates (shared by both dialects) are a full boolean
expression grammar, parsed by a recursive-descent parser:

- comparisons ``@.a.b op X`` with ops ``== = is != <> is not > >= <
  <=`` and ``in`` / ``not in`` against list literals ``[1, 2]`` /
  ``('a', 'b')``;
- both operands may be ``@``-paths (field-to-field comparison:
  ``@.price < @.limit``) or literals; bare ``@`` is the item itself;
- existence/truthiness atoms: ``@.k`` alone keeps items where the key
  exists with a truthy value;
- boolean connectives ``&``/``and``, ``|``/``or``, negation
  ``!``/``not``, and parenthesized groups, with the usual
  not > and > or precedence.

Index scripts ``[(@.length-1)]`` (the one arithmetic shape
jsonpath-rw-ext defines) resolve to ``len±N``.

Anything beyond the subset — bare-word unions ``[a,b]``, general
script expressions ``[(...)]``, functions — raises
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
  | \[(?P<funion>(?:'[^']*'|"[^"]*")(?:\s*,\s*(?:'[^']*'|"[^"]*"))+)\]
  | \['(?P<qfield>[^']*)'\]
  | \["(?P<qqfield>[^"]*)"\]
  | \[(?P<bracket>[^\]]*)\]
    """,
    re.VERBOSE,
)


def _scan_bracket(s: str, pos: int) -> Tuple[str, int]:
    """``s[pos] == '['`` → (body, end_pos_after_close): finds the
    MATCHING ``]`` by depth-counting brackets/parens and skipping
    quoted strings, so filter bodies may contain nested ``[...]`` list
    literals and ``(...)`` groups (the single-regex step tokenizer
    stopped at the first ``]``)."""
    depth = 0
    i = pos
    n = len(s)
    while i < n:
        c = s[i]
        if c in "'\"":
            j = s.find(c, i + 1)
            if j < 0:
                break
            i = j + 1
            continue
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
            if depth == 0:
                return s[pos + 1 : i], i + 1
        i += 1
    raise UnsupportedPathError(
        f"unsupported path syntax: unbalanced bracket at offset {pos} in {s!r}"
    )

_QUOTED = re.compile(r"""'([^']*)'|"([^"]*)\"""")

_OPS = {
    "=": lambda a, b: a == b,
    "==": lambda a, b: a == b,
    "is": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "<>": lambda a, b: a != b,
    "is not": lambda a, b: a != b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "in": lambda a, b: a in b,
    "not in": lambda a, b: a not in b,
    # jsonpath-rw-ext regex match: `@.k =~ "pat"` — re.search semantics,
    # non-string operands never match (same false-not-error contract as
    # the type-mismatch comparisons below)
    "=~": lambda a, b: (
        isinstance(a, str)
        and isinstance(b, str)
        and re.search(b, a) is not None
    ),
}

# ----------------------------------------------------- filter expressions
# Tokenizer for the predicate grammar; longest-match-first alternation.
_FTOK = re.compile(
    r"""\s*(?:
        (?P<str>'[^']*'|"[^"]*")
      | (?P<num>-?\d+\.\d+|-?\d+)
      | (?P<at>@(?:\.[\w-]+)*)
      | (?P<word>and|or|not\s+in|not|in|is\s+not|is|true|false|null)\b
      | (?P<op>==|!=|<>|>=|<=|=~|=|>|<|&&|\|\||&|\||!)
      | (?P<arith>[-+*/%])
      | (?P<punc>[()\[\],])
    )""",
    re.VERBOSE,
)

_MISSING = object()  # sentinel: @-path didn't resolve on this item


class _Tok(NamedTuple):
    kind: str
    val: Any


def _tokenize_filter(expr: str) -> List[_Tok]:
    toks: List[_Tok] = []
    pos = 0
    while pos < len(expr):
        if expr[pos].isspace():
            pos += 1
            continue
        m = _FTOK.match(expr, pos)
        if not m:
            raise UnsupportedPathError(
                f"unsupported filter expression: {expr!r} at {expr[pos:pos+12]!r}"
            )
        pos = m.end()
        if m.group("str") is not None:
            toks.append(_Tok("lit", m.group("str")[1:-1]))
        elif m.group("num") is not None:
            n = m.group("num")
            toks.append(_Tok("lit", float(n) if "." in n else int(n)))
        elif m.group("at") is not None:
            parts = m.group("at")[1:]
            toks.append(_Tok("at", tuple(parts.split(".")[1:]) if parts else ()))
        elif m.group("word") is not None:
            w = re.sub(r"\s+", " ", m.group("word"))
            if w in ("true", "false", "null"):
                toks.append(_Tok("lit", {"true": True, "false": False, "null": None}[w]))
            elif w in ("and", "or", "not"):
                toks.append(_Tok(w, w))
            else:  # in / not in / is / is not -> comparison ops
                toks.append(_Tok("cmp", w))
        elif m.group("op") is not None:
            o = m.group("op")
            if o in ("&", "&&"):
                toks.append(_Tok("and", o))
            elif o in ("|", "||"):
                toks.append(_Tok("or", o))
            elif o == "!":
                toks.append(_Tok("not", o))
            else:
                toks.append(_Tok("cmp", o))
        elif m.group("arith") is not None:
            toks.append(_Tok("arith", m.group("arith")))
        else:
            toks.append(_Tok(m.group("punc"), m.group("punc")))
    return toks


_ARITH = {
    "+": lambda a, b: a + b,
    "-": lambda a, b: a - b,
    "*": lambda a, b: a * b,
    "/": lambda a, b: a / b,
    "%": lambda a, b: a % b,
}


class _FilterParser:
    """Recursive-descent parser for filter predicates; produces a
    closure item -> bool.  Grammar (precedence low to high):

        expr   := and ( OR  and )*
        and    := not ( AND not )*
        not    := NOT not | atom
        atom   := '(' expr ')' | operand ( CMP rhs )?
        operand:= term ( ('+'|'-') term )*      -- arithmetic (jsonpath-rw-ext)
        term   := factor ( ('*'|'/'|'%') factor )*
        factor := @path | literal
        rhs    := operand | '[' literal, ... ']' | '(' literal, ... ')'

    A negative NUMBER literal directly after an operand is absorbed as
    subtraction (``@.a -1`` ≡ ``@.a - 1`` — the tokenizer binds the
    sign to the digit).  Arithmetic errors on an item (type mismatch,
    division by zero) resolve to MISSING, so the enclosing comparison
    is False for that item — errors-as-data, same policy as unresolved
    @-paths.  Parenthesized arithmetic is not supported (parens group
    booleans); spell ``(@.a + 1) * 2`` as ``@.a * 2 + 2``.
    """

    def __init__(self, expr: str):
        self.expr = expr
        self.toks = _tokenize_filter(expr)
        self.pos = 0

    def _peek(self) -> Optional[_Tok]:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise UnsupportedPathError(
                f"unsupported filter expression (truncated): {self.expr!r}"
            )
        self.pos += 1
        return t

    def parse(self):
        fn = self._expr()
        if self._peek() is not None:
            raise UnsupportedPathError(
                f"unsupported filter expression (trailing tokens): {self.expr!r}"
            )
        return lambda item: bool(fn(item))

    def _expr(self):
        terms = [self._and()]
        while (t := self._peek()) and t.kind == "or":
            self._next()
            terms.append(self._and())
        if len(terms) == 1:
            return terms[0]
        return lambda item, fs=tuple(terms): any(f(item) for f in fs)

    def _and(self):
        terms = [self._not()]
        while (t := self._peek()) and t.kind == "and":
            self._next()
            terms.append(self._not())
        if len(terms) == 1:
            return terms[0]
        return lambda item, fs=tuple(terms): all(f(item) for f in fs)

    def _not(self):
        if (t := self._peek()) and t.kind == "not":
            self._next()
            inner = self._not()
            return lambda item, f=inner: not f(item)
        return self._atom()

    def _atom(self):
        t = self._peek()
        if t is None:
            raise UnsupportedPathError(
                f"unsupported filter expression (truncated): {self.expr!r}"
            )
        if t.kind == "(":
            self._next()
            inner = self._expr()
            if self._peek() is None or self._next().kind != ")":
                raise UnsupportedPathError(
                    f"unsupported filter expression (unbalanced parens): {self.expr!r}"
                )
            return inner
        left = self._operand()
        nxt = self._peek()
        if nxt is not None and nxt.kind == "cmp":
            op = self._next().val
            fn = _OPS.get(op)
            if fn is None:
                raise UnsupportedPathError(f"unsupported filter op: {op!r}")
            right = self._rhs(op)
            def cmp(item, l=left, r=right, f=fn):
                a, b = l(item), r(item)
                if a is _MISSING or b is _MISSING:
                    return False
                try:
                    return bool(f(a, b))
                except TypeError:
                    return False
            return cmp
        # bare operand: existence + truthiness
        return lambda item, l=left: l(item) is not _MISSING and bool(l(item))

    def _operand(self):
        left = self._term()
        while True:
            t = self._peek()
            if t is not None and t.kind == "arith" and t.val in ("+", "-"):
                self._next()
                left = self._arith_bin(left, t.val, self._term())
            elif (
                t is not None
                and t.kind == "lit"
                and isinstance(t.val, (int, float))
                and not isinstance(t.val, bool)
                and t.val < 0
            ):
                # '@.a -1': the tokenizer bound the sign to the digit
                self._next()
                right = t.val
                left = self._arith_bin(left, "+", lambda item, v=right: v)
            else:
                return left

    def _term(self):
        left = self._factor()
        while (t := self._peek()) and t.kind == "arith" and t.val in ("*", "/", "%"):
            self._next()
            left = self._arith_bin(left, t.val, self._factor())
        return left

    @staticmethod
    def _arith_bin(lf, op: str, rf):
        fn = _ARITH[op]
        def run(item, lf=lf, rf=rf, fn=fn):
            a, b = lf(item), rf(item)
            if a is _MISSING or b is _MISSING:
                return _MISSING
            try:
                return fn(a, b)
            except (TypeError, ZeroDivisionError):
                return _MISSING
        return run

    def _factor(self):
        t = self._next()
        if t.kind == "at":
            return lambda item, ks=t.val: _at_resolve(item, ks)
        if t.kind == "lit":
            return lambda item, v=t.val: v
        raise UnsupportedPathError(
            f"unsupported filter operand in {self.expr!r}: {t.val!r}"
        )

    def _rhs(self, op: str):
        t = self._peek()
        if t is not None and t.kind in ("[", "(") and op in ("in", "not in"):
            close = "]" if t.kind == "[" else ")"
            self._next()
            vals: List[Any] = []
            while True:
                tok = self._next()
                if tok.kind == close and not vals:
                    break  # empty list
                if tok.kind != "lit":
                    raise UnsupportedPathError(
                        f"unsupported list literal in filter: {self.expr!r}"
                    )
                vals.append(tok.val)
                sep = self._next()
                if sep.kind == close:
                    break
                if sep.kind != ",":
                    raise UnsupportedPathError(
                        f"unsupported list literal in filter: {self.expr!r}"
                    )
            return lambda item, v=tuple(vals): v
        return self._operand()


def _at_resolve(item: Any, keys: Tuple[str, ...]) -> Any:
    """Evaluate an ``@.a.b`` reference on one item; ``@`` alone is the
    item itself.  A literal dotted key wins over traversal (an item
    ``{'a.b': 1}`` matches ``@.a.b``), mirroring the pre-grammar
    behavior."""
    if not keys:
        return item
    dotted = ".".join(keys)
    if isinstance(item, dict) and dotted in item:
        return item[dotted]
    val = item
    for part in keys:
        if not isinstance(val, dict) or part not in val:
            return _MISSING
        val = val[part]
    return val


def _filter_pred(expr: str):
    return _FilterParser(expr).parse()


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
        # filter steps are depth-scanned (their bodies may nest
        # brackets/parens/quotes beyond what one regex can tokenize)
        if s[pos] == "[":
            body, end = _scan_bracket(s, pos)
            st = body.strip()
            if st.startswith("?"):
                inner = st[1:].strip()
                if not (inner.startswith("(") and inner.endswith(")")):
                    raise UnsupportedPathError(
                        f"unsupported path syntax: filter {st!r} in {path!r}"
                    )
                steps.append(Step("filter", _filter_pred(inner[1:-1])))
                pos = end
                continue
            if st.startswith(("@", "!", "not ", "not@")):
                steps.append(Step("filter", _filter_pred(st)))
                pos = end
                continue
            if st.startswith("(") and st.endswith(")"):
                # index script: the one arithmetic shape jsonpath-rw-ext
                # actually defines, [(@.length-1)] = last element
                m_len = re.match(
                    r"^@\.length\s*(?:(?P<sign>[-+])\s*(?P<n>\d+))?$",
                    st[1:-1].strip(),
                )
                if not m_len:
                    raise UnsupportedPathError(
                        f"unsupported path syntax: script expression {st!r} in {path!r}"
                    )
                n = int(m_len.group("n") or 0)
                offset = -n if m_len.group("sign") == "-" else n
                steps.append(Step("idxscript", offset))
                pos = end
                continue
            # not a filter: fall through to the regular step tokenizer
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
        elif step.kind == "idxscript":  # [(@.length+off)]: index len+off
            if isinstance(v, (list, tuple)):
                idx = len(v) + step.arg
                if 0 <= idx < len(v):
                    out.append(v[idx])
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
