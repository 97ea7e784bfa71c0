"""XPath 1.0 subset over the mini-DOM (HTML and XML trees).

The reference's xml parser is CSS-selector based and says so ("not
support `xpath` for now", /root/reference/uniparser/parsers.py:336);
this module goes BEYOND the reference to cover the rule language the
north star names (CSS / XPath / regex / JSONPath chains).  Semantics
follow the XPath 1.0 spec (as lxml implements it) for the documented
subset; anything outside it raises :class:`UnsupportedXPathError`
naming the construct, never a silent wrong answer.

Supported grammar::

    union    := path ('|' path)*
    path     := ('/' | '//')? step (('/' | '//') step)*
    step     := '.' | '..' | '@NAME' | (axis '::')? nodetest pred*
    axis     := 'child' | 'attribute' | 'self' | 'parent'
              | 'descendant' | 'descendant-or-self'
              | 'ancestor' | 'ancestor-or-self'
              | 'following-sibling' | 'preceding-sibling'
    nodetest := NAME | '*' | 'text()' | 'node()'
    pred     := '[' or-expr ']'
    or-expr  := and-expr ('or' and-expr)*
    and-expr := atom ('and' atom)*
    atom     := INTEGER | 'last()' | 'position()' CMP INTEGER
              | 'not(' or-expr ')' | '(' or-expr ')'
              | 'contains(' value ',' LITERAL ')'
              | 'starts-with(' value ',' LITERAL ')'
              | value | value CMP (LITERAL | NUMBER)
    value    := '@NAME' | 'text()' | '.' | NAME
              | 'normalize-space(' value? ')'
    CMP      := '=' | '!='  ( '<' '<=' '>' '>=' also valid on position() )

Reverse axes (ancestor*, preceding-sibling) number predicate positions
nearest-first per XPath 1.0 — ``preceding-sibling::td[1]`` is the
NEAREST preceding ``td`` — while result node-sets surface in document
order, matching lxml.

Node-set semantics that matter (and are tested):

- ``//tag[1]`` selects the first *tag* child of EVERY context node
  (predicate position is per expanded ``descendant-or-self`` context),
  exactly as XPath 1.0 specifies — not "first match in document".
- Result node-sets are deduplicated in first-occurrence (document)
  order.
- ``text()`` steps yield the text nodes' data (strings); ``@name``
  steps yield raw attribute values; both are terminal (a step after
  them is an error in this subset).
- Value comparisons use XPath string-value: ``.`` is the element's
  concatenated text, a NAME operand is the first matching child's
  string-value, ``@a`` the attribute value, ``text()`` the first text
  child.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import Any, List, Optional, Tuple

from .nodes import Element, Text


class UnsupportedXPathError(ValueError):
    """Raised for XPath constructs outside the documented subset."""


# --------------------------------------------------------------- tokenizing

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<name>[A-Za-z_][\w.-]*)
      | (?P<str>'[^']*'|"[^"]*")
      | (?P<op>!=|<=|>=|=|<|>|\(|\)|,|@|\.)
    )""",
    re.VERBOSE,
)


def _tokenize(expr: str) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    pos = 0
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if m is None:
            if expr[pos:].strip() == "":
                break
            raise UnsupportedXPathError(
                f"cannot tokenize predicate at {expr[pos:]!r}"
            )
        pos = m.end()
        for kind in ("num", "name", "str", "op"):
            val = m.group(kind)
            if val is not None:
                out.append((kind, val))
                break
    return out


class _Toks:
    def __init__(self, toks: List[Tuple[str, str]], src: str):
        self.toks = toks
        self.i = 0
        self.src = src

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        t = self.peek()
        if t is None:
            raise UnsupportedXPathError(f"unexpected end of predicate {self.src!r}")
        self.i += 1
        return t

    def eat(self, kind: str, val: Optional[str] = None) -> str:
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise UnsupportedXPathError(
                f"expected {val or kind} in predicate {self.src!r}, got {v!r}"
            )
        return v


# ---------------------------------------------------------- predicate parse
#
# AST tuples:
#   ('pos', cmp, n)  ('last',)  ('not', e)  ('and', a, b)  ('or', a, b)
#   ('exists', valuespec)  ('cmp', valuespec, op, literal_or_number)
#   ('contains', valuespec, lit)  ('starts', valuespec, lit)
# valuespec: ('attr', name) | ('text',) | ('dot',) | ('child', name)

_CMP_OPS = {"=", "!=", "<", "<=", ">", ">="}


def _parse_or(t: _Toks):
    node = _parse_and(t)
    while t.peek() == ("name", "or"):
        t.next()
        node = ("or", node, _parse_and(t))
    return node


def _parse_and(t: _Toks):
    node = _parse_atom(t)
    while t.peek() == ("name", "and"):
        t.next()
        node = ("and", node, _parse_atom(t))
    return node


def _parse_value(t: _Toks):
    kind, val = t.next()
    if (kind, val) == ("op", "@"):
        return ("attr", t.eat("name"))
    if (kind, val) == ("op", "."):
        return ("dot",)
    if kind == "name":
        if t.peek() == ("op", "("):
            if val == "text":
                t.next()
                t.eat("op", ")")
                return ("text",)
            if val == "normalize-space":
                t.next()
                if t.peek() == ("op", ")"):
                    t.next()
                    return ("norm", ("dot",))
                inner = _parse_value(t)
                t.eat("op", ")")
                return ("norm", inner)
            raise UnsupportedXPathError(f"unsupported function {val}() as operand")
        return ("child", val)
    raise UnsupportedXPathError(f"unsupported operand {val!r} in {t.src!r}")


def _parse_atom(t: _Toks):
    kind, val = t.next()
    if kind == "num":
        return ("pos", "=", float(val))
    if (kind, val) == ("op", "("):
        node = _parse_or(t)
        t.eat("op", ")")
        return node
    if kind == "name" and val in ("last", "position") and t.peek() == ("op", "("):
        t.next()
        t.eat("op", ")")
        if val == "last":
            # bare [last()] or position() vs last() comparisons are out
            return ("last",)
        k2, op = t.next()
        if k2 != "op" or op not in _CMP_OPS:
            raise UnsupportedXPathError(f"position() needs a comparison in {t.src!r}")
        return ("pos", op, float(t.eat("num")))
    if kind == "name" and val == "not" and t.peek() == ("op", "("):
        t.next()
        node = _parse_or(t)
        t.eat("op", ")")
        return ("not", node)
    if kind == "name" and val in ("contains", "starts-with") and t.peek() == ("op", "("):
        t.next()
        spec = _parse_value(t)
        t.eat("op", ",")
        k2, lit = t.next()
        if k2 != "str":
            raise UnsupportedXPathError(f"{val}() needs a string literal in {t.src!r}")
        t.eat("op", ")")
        return ("contains" if val == "contains" else "starts", spec, lit[1:-1])
    # value [CMP literal]
    t.i -= 1
    spec = _parse_value(t)
    nxt = t.peek()
    if nxt is not None and nxt[0] == "op" and nxt[1] in _CMP_OPS:
        op = t.next()[1]
        k2, lit = t.next()
        if k2 == "str":
            if op not in ("=", "!="):
                raise UnsupportedXPathError(f"{op} on strings in {t.src!r}")
            return ("cmp", spec, op, lit[1:-1])
        if k2 == "num":
            return ("cmp", spec, op, float(lit))
        raise UnsupportedXPathError(f"bad comparison literal {lit!r} in {t.src!r}")
    return ("exists", spec)


def _parse_predicate(src: str):
    t = _Toks(_tokenize(src), src)
    node = _parse_or(t)
    if t.peek() is not None:
        raise UnsupportedXPathError(f"trailing tokens in predicate {src!r}")
    return node


# ------------------------------------------------------------- path parsing
#
# step: (kind, name, preds)  kind in tag|star|text|node|self|parent|attr

_STEP_HEAD = re.compile(r"(@?)([A-Za-z_*][\w.*-]*(?:\(\))?|\.{1,2})")


def _split_top(s: str, sep: str) -> List[str]:
    """Split on `sep` outside brackets and quotes."""
    parts, depth, quote, last = [], 0, "", 0
    for i, ch in enumerate(s):
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[last:i])
            last = i + 1
    parts.append(s[last:])
    return parts


#: explicit axes the subset evaluates.  Reverse axes number predicate
#: positions nearest-first per XPath 1.0 (ancestor[1] = parent,
#: preceding-sibling[1] = nearest preceding sibling) but results are
#: returned in document order, as lxml does.
_AXES = frozenset({
    "child", "attribute", "self", "parent",
    "descendant", "descendant-or-self",
    "ancestor", "ancestor-or-self",
    "following-sibling", "preceding-sibling",
})
_REVERSE_AXES = frozenset({"ancestor", "ancestor-or-self", "preceding-sibling"})


def _parse_step(src: str) -> Tuple[str, str, Optional[str], list]:
    src = src.strip()
    axis = "child"
    if "::" in src:
        ax, rest = src.split("::", 1)
        ax = ax.strip()
        if ax not in _AXES:
            raise UnsupportedXPathError(
                f"unsupported axis {ax}:: (subset: {', '.join(sorted(_AXES))})"
            )
        axis = ax
        src = "@" + rest if ax == "attribute" else rest
    m = _STEP_HEAD.match(src)
    if m is None:
        raise UnsupportedXPathError(f"cannot parse step {src!r}")
    at, head = m.group(1), m.group(2)
    rest = src[m.end():].strip()
    if rest.startswith("("):
        raise UnsupportedXPathError(
            f"unsupported function {head}(...) — subset has no path-level functions"
        )
    preds: list = []
    while rest.startswith("["):
        depth, quote = 0, ""
        for i, ch in enumerate(rest):
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "'\"":
                quote = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    preds.append(_parse_predicate(rest[1:i]))
                    rest = rest[i + 1:].strip()
                    break
        else:
            raise UnsupportedXPathError(f"unbalanced predicate in step {src!r}")
    if rest:
        raise UnsupportedXPathError(f"trailing characters {rest!r} in step {src!r}")
    if at:
        if head.endswith("()") or head in (".", "..", "*"):
            raise UnsupportedXPathError(f"bad attribute step @{head}")
        return ("attribute", "attr", head, preds)
    if head == ".":
        return ("self", "node", None, preds)
    if head == "..":
        return ("parent", "node", None, preds)
    if head == "*":
        return (axis, "star", None, preds)
    if head.endswith("()"):
        fn = head[:-2]
        if fn == "text":
            return (axis, "text", None, preds)
        if fn == "node":
            return (axis, "node", None, preds)
        raise UnsupportedXPathError(f"unsupported node test {head}")
    return (axis, "tag", head, preds)


def _parse_path(path: str) -> List[Tuple[str, Tuple[str, str, Optional[str], list]]]:
    """Return [(sep, step)] where sep is '/' or '//'."""
    p = path.strip()
    if not p:
        raise UnsupportedXPathError("empty path")
    # normalize '//' into a marker that survives a '/'-split
    p = p.replace("//", "/\x00")
    segs = _split_top(p, "/")
    steps: List[Tuple[str, Tuple[str, str, Optional[str], list]]] = []
    # leading '': absolute path rooted at the document — our evaluation
    # context IS the document root, so absolute and relative coincide
    if segs and segs[0] == "":
        segs = segs[1:]
    for seg in segs:
        sep = "/"
        if seg.startswith("\x00"):
            sep = "//"
            seg = seg[1:]
        if seg.strip() == "":
            raise UnsupportedXPathError(f"empty step in path {path!r}")
        steps.append((sep, _parse_step(seg)))
    return steps


# --------------------------------------------------------------- evaluation


def _attr_raw(el: Element, name: str) -> Optional[str]:
    """Attribute value without HTML list-attr (class) splitting."""
    for k, v in el.attrs:
        if k == name:
            return "" if v is None else v
    return None


def _string_value(node: Any) -> str:
    if isinstance(node, Element):
        return node.text
    if isinstance(node, Text):
        return node.data
    return "" if node is None else str(node)


def _operand_string(node: Any, spec) -> Optional[str]:
    """XPath string-value of an operand, None when the node-set is empty."""
    if spec[0] == "norm":
        v = _operand_string(node, spec[1])
        return None if v is None else " ".join(v.split())
    if spec[0] == "dot":
        return _string_value(node)
    if not isinstance(node, Element):
        return None
    if spec[0] == "attr":
        return _attr_raw(node, spec[1])
    if spec[0] == "text":
        for c in node.children:
            if isinstance(c, Text):
                return c.data
        return None
    # child element string-value (first match)
    for c in node.children:
        if isinstance(c, Element) and c.tag == spec[1]:
            return c.text
    return None


def _num_cmp(a: float, op: str, b: float) -> bool:
    return {
        "=": a == b, "!=": a != b, "<": a < b,
        "<=": a <= b, ">": a > b, ">=": a >= b,
    }[op]


def _eval_pred(ast, node: Any, pos: int, size: int) -> bool:
    k = ast[0]
    if k == "pos":
        return _num_cmp(float(pos), ast[1], ast[2])
    if k == "last":
        return pos == size
    if k == "not":
        return not _eval_pred(ast[1], node, pos, size)
    if k == "and":
        return _eval_pred(ast[1], node, pos, size) and _eval_pred(ast[2], node, pos, size)
    if k == "or":
        return _eval_pred(ast[1], node, pos, size) or _eval_pred(ast[2], node, pos, size)
    if k == "exists":
        spec = ast[1]
        if spec[0] == "norm":
            v = _operand_string(node, spec)
            return bool(v)  # boolean(string): true iff non-empty
        if spec[0] == "dot":
            return True
        if spec[0] == "attr":
            return isinstance(node, Element) and _attr_raw(node, spec[1]) is not None
        if spec[0] == "text":
            return isinstance(node, Element) and any(
                isinstance(c, Text) for c in node.children
            )
        return isinstance(node, Element) and any(
            isinstance(c, Element) and c.tag == spec[1] for c in node.children
        )
    if k == "cmp":
        spec, op, lit = ast[1], ast[2], ast[3]
        # node-set comparison: true if ANY node's string-value matches
        vals: List[str] = []
        if spec[0] == "text" and isinstance(node, Element):
            vals = [c.data for c in node.children if isinstance(c, Text)]
        elif spec[0] == "child" and isinstance(node, Element):
            vals = [c.text for c in node.children
                    if isinstance(c, Element) and c.tag == spec[1]]
        else:
            v = _operand_string(node, spec)
            vals = [] if v is None else [v]
        if isinstance(lit, float):
            for v in vals:
                try:
                    if _num_cmp(float(v), op, lit):
                        return True
                except ValueError:
                    continue
            return False
        if op == "=":
            return lit in vals
        return any(v != lit for v in vals)
    if k in ("contains", "starts"):
        v = _operand_string(node, ast[1])
        if v is None:
            return False
        return (ast[2] in v) if k == "contains" else v.startswith(ast[2])
    raise UnsupportedXPathError(f"unknown predicate node {ast!r}")  # pragma: no cover


def _self_and_descendants(node: Any) -> List[Element]:
    if not isinstance(node, Element):
        return []
    return [node] + list(node.iter_elements())


def _walk_nodes(node: Element) -> List[Any]:
    """All descendant nodes (elements AND text) in document order."""
    out: List[Any] = []
    stack = node.children[::-1]
    while stack:
        n = stack.pop()
        if isinstance(n, (Element, Text)):
            out.append(n)
            if isinstance(n, Element) and n.children:
                stack.extend(n.children[::-1])
    return out


def _node_test(nodes: List[Any], kind: str, name: Optional[str]) -> List[Any]:
    # the synthetic "[document]" root is the XPath root NODE, not an
    # element: ancestor::* / parent::* exclude it; node() keeps it
    if kind == "tag":
        return [n for n in nodes if isinstance(n, Element) and n.tag == name]
    if kind == "star":
        return [n for n in nodes if isinstance(n, Element) and n.tag != "[document]"]
    if kind == "text":
        return [n for n in nodes if isinstance(n, Text)]
    return [n for n in nodes if isinstance(n, (Element, Text))]  # node()


def _axis_candidates(c: Any, axis: str) -> List[Any]:
    """Raw candidate nodes for an axis, in AXIS order (reverse axes
    nearest-first, per XPath 1.0 positional semantics)."""
    if axis == "self":
        return [c]
    if axis == "parent":
        p = c.parent if isinstance(c, (Element, Text)) else None
        return [p] if isinstance(p, Element) else []
    if axis in ("ancestor", "ancestor-or-self"):
        out = [c] if axis == "ancestor-or-self" else []
        p = c.parent if isinstance(c, (Element, Text)) else None
        while isinstance(p, Element):
            out.append(p)
            p = p.parent
        return out
    if axis in ("following-sibling", "preceding-sibling"):
        p = c.parent if isinstance(c, (Element, Text)) else None
        if not isinstance(p, Element):
            return []
        sibs = p.children
        for i, n in enumerate(sibs):
            if n is c:
                if axis == "following-sibling":
                    return list(sibs[i + 1:])
                return list(sibs[:i])[::-1]  # nearest-first
        return []
    if not isinstance(c, Element):
        return []  # text nodes / attr strings have no children
    if axis == "child":
        return list(c.children)
    if axis == "descendant":
        return _walk_nodes(c)
    # descendant-or-self
    return [c] + _walk_nodes(c)


def _apply_step(contexts: List[Any], sep: str, step) -> List[Any]:
    axis, kind, name, preds = step
    if sep == "//":
        expanded: List[Element] = []
        seen = set()
        for c in contexts:
            for n in _self_and_descendants(c):
                if id(n) not in seen:
                    seen.add(id(n))
                    expanded.append(n)
        contexts = expanded
    out: List[Any] = []
    out_seen = set()
    for c in contexts:
        if kind == "attr":
            v = _attr_raw(c, name) if isinstance(c, Element) else None
            cands: List[Any] = [] if v is None else [v]
        else:
            cands = _node_test(_axis_candidates(c, axis), kind, name)
        # predicates filter sequentially: each re-numbers positions
        # (in axis order — reverse axes count nearest-first)
        for pred in preds:
            size = len(cands)
            cands = [n for i, n in enumerate(cands, 1) if _eval_pred(pred, n, i, size)]
        if axis in _REVERSE_AXES:
            cands.reverse()  # node-set results surface in document order
        for n in cands:
            if id(n) not in out_seen:
                out_seen.add(id(n))
                out.append(n)
    return out


@lru_cache(maxsize=4096)
def _compile(path: str):
    """Parse once per distinct path (the operator runs per row)."""
    compiled = []
    for alt in _split_top(path, "|"):
        if alt.strip() == "":
            raise UnsupportedXPathError(f"empty union branch in {path!r}")
        compiled.append((alt, _parse_path(alt)))
    return tuple(compiled)


def xpath_select(root: Element, path: str) -> List[Any]:
    """Evaluate an XPath (subset) against a DOM root.

    Returns elements for element-valued paths; raw strings for paths
    ending in ``@attr`` or ``text()``, deduplicated in first-occurrence
    document order.
    """
    results: List[Any] = []
    seen = set()
    for alt, steps in _compile(path):
        nodes: List[Any] = [root]
        for sep, step in steps:
            if nodes and not isinstance(nodes[0], (Element, Text)):
                raise UnsupportedXPathError(
                    f"step after @attr/text() result in {alt.strip()!r}"
                )
            nodes = _apply_step(nodes, sep, step)
        for n in nodes:
            if id(n) not in seen:
                seen.add(id(n))
                results.append(n)
    return [n.data if isinstance(n, Text) else n for n in results]
