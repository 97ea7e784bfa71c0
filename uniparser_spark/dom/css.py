"""CSS selector engine for the mini-DOM.

Covers the selector subset exercised by the reference corpus
(/root/reference/test_parsers.py:170-356, config.py:33-58,
README.md:99): type / ``*``, ``.class``, ``#id``, ``[attr]`` /
``[attr=v]`` (+ ``~= ^= $= *=``), descendant, child ``>``, adjacent
``+``, general sibling ``~``, comma groups, and the structural
pseudo-classes ``:first-child :last-child :first-of-type :last-of-type
:nth-child() :nth-of-type()`` (an+b, odd, even).

Selection returns descendants of the scope node in document order,
matching bs4/soupsieve ``select``.
"""

from __future__ import annotations

import re
from functools import lru_cache
from typing import List, NamedTuple, Optional, Tuple

from .nodes import Element

_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comb>[>+~,])
  | (?P<type>\*|[A-Za-z][-\w]*)
  | \.(?P<class>[-\w]+)
  | \#(?P<id>[-\w]+)
  | \[(?P<aname>[-\w:]+)\s*(?:(?P<aop>[~^$*|]?=)\s*(?P<aval>"[^"]*"|'[^']*'|[^\]\s]+)\s*)?\]
  | :(?P<pseudo>[-\w]+)(?:\((?P<parg>[^)]*)\))?
    """,
    re.VERBOSE,
)


class Compound(NamedTuple):
    type: Optional[str]            # None or '*' or tag name
    classes: Tuple[str, ...]
    ids: Tuple[str, ...]
    attrs: Tuple[Tuple[str, Optional[str], Optional[str]], ...]  # (name, op, value)
    pseudos: Tuple[Tuple[str, Optional[str]], ...]               # (name, arg)


class _CompoundAcc:
    def __init__(self):
        self.type = None
        self.classes: List[str] = []
        self.ids: List[str] = []
        self.attrs: List[Tuple[str, Optional[str], Optional[str]]] = []
        self.pseudos: List[Tuple[str, Optional[str]]] = []
        self.touched = False

    def freeze(self) -> Compound:
        return Compound(
            self.type,
            tuple(self.classes),
            tuple(self.ids),
            tuple(self.attrs),
            tuple(self.pseudos),
        )


# A selector is a list of (combinator, Compound) evaluated left→right;
# the first entry's combinator is ' ' relative to the scope.
Selector = Tuple[Tuple[str, Compound], ...]


class SelectorSyntaxError(ValueError):
    pass


@lru_cache(maxsize=4096)
def compile_selector(selector: str) -> Tuple[Selector, ...]:
    groups: List[Selector] = []
    parts: List[Tuple[str, Compound]] = []
    acc = _CompoundAcc()
    pending_comb = " "
    pos = 0
    pending_ws = False

    def flush_compound():
        nonlocal acc, pending_comb, pending_ws
        if acc.touched:
            parts.append((pending_comb, acc.freeze()))
            acc = _CompoundAcc()
            pending_comb = " "
        pending_ws = False

    while pos < len(selector):
        m = _TOKEN.match(selector, pos)
        if not m:
            raise SelectorSyntaxError(f"bad selector {selector!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind == "ws":
            pending_ws = True
            continue
        if kind == "comb":
            c = m.group("comb")
            if c == ",":
                flush_compound()
                if not parts:
                    raise SelectorSyntaxError(f"empty selector in {selector!r}")
                groups.append(tuple(parts))
                parts = []
            else:
                flush_compound()
                pending_comb = c
            continue
        # a simple-selector token: if whitespace separated it from the
        # previous compound, that whitespace was a descendant combinator
        if pending_ws and acc.touched:
            flush_compound()
        pending_ws = False
        acc.touched = True
        if kind == "type":
            acc.type = m.group("type")
        elif kind == "class":
            acc.classes.append(m.group("class"))
        elif kind == "id":
            acc.ids.append(m.group("id"))
        elif kind == "aname":
            val = m.group("aval")
            if val and val[0] in "\"'" and val[-1] == val[0]:
                val = val[1:-1]
            acc.attrs.append((m.group("aname"), m.group("aop"), val))
        elif kind == "pseudo":
            acc.pseudos.append((m.group("pseudo").lower(), m.group("parg")))
    flush_compound()
    if parts:
        groups.append(tuple(parts))
    if not groups:
        raise SelectorSyntaxError(f"empty selector {selector!r}")
    return tuple(groups)


def _parse_anb(arg: str) -> Tuple[int, int]:
    """Parse an+b micro-syntax → (a, b)."""
    s = arg.strip().lower()
    if s == "odd":
        return 2, 1
    if s == "even":
        return 2, 0
    m = re.fullmatch(r"([+-]?\d*)n\s*([+-]\s*\d+)?", s)
    if m:
        a_s = m.group(1)
        a = int(a_s) if a_s not in ("", "+", "-") else (-1 if a_s == "-" else 1)
        b = int(m.group(2).replace(" ", "")) if m.group(2) else 0
        return a, b
    return 0, int(s)


def _anb_matches(a: int, b: int, index: int) -> bool:
    if a == 0:
        return index == b
    k, rem = divmod(index - b, a)
    return rem == 0 and k >= 0


def _type_matches(el: Element, t: str) -> bool:
    if t == "*":
        return True
    return el.tag == t or el.tag == t.lower()


def _pseudo_matches(el: Element, name: str, arg: Optional[str]) -> bool:
    parent = el.parent
    if name in ("first-child", "last-child", "only-child", "nth-child", "nth-last-child"):
        sibs = parent.element_children() if parent else [el]
    elif name in ("first-of-type", "last-of-type", "only-of-type", "nth-of-type", "nth-last-of-type"):
        sibs = [c for c in (parent.element_children() if parent else [el]) if c.tag == el.tag]
    elif name == "not":
        comp_groups = compile_selector(arg or "*")
        return not any(
            len(sel) == 1 and _compound_matches(el, sel[0][1]) for sel in comp_groups
        )
    elif name == "empty":
        return not el.children
    else:
        # unknown pseudo-class: match nothing (strict would raise)
        return False
    idx = sibs.index(el) + 1
    if name.startswith("first-"):
        return idx == 1
    if name.startswith("last-"):
        return idx == len(sibs)
    if name.startswith("only-"):
        return len(sibs) == 1
    a, b = _parse_anb(arg or "0")
    if name.startswith("nth-last-"):
        idx = len(sibs) - idx + 1
    return _anb_matches(a, b, idx)


def _attr_matches(el: Element, name: str, op: Optional[str], value: Optional[str]) -> bool:
    raw = None
    for k, v in el.attrs:
        if k == name:
            raw = "" if v is None else v
            break
    if raw is None:
        return False
    if op is None:
        return True
    if op == "=":
        return raw == value
    if op == "~=":
        return value in raw.split()
    if op == "^=":
        return bool(value) and raw.startswith(value)
    if op == "$=":
        return bool(value) and raw.endswith(value)
    if op == "*=":
        return bool(value) and value in raw
    if op == "|=":
        return raw == value or raw.startswith(f"{value}-")
    return False


def _compound_matches(el: Element, comp: Compound) -> bool:
    if comp.type is not None and not _type_matches(el, comp.type):
        return False
    if comp.ids and any(el.get("id") != i for i in comp.ids):
        return False
    if comp.classes:
        have = el.get("class") or []
        if isinstance(have, str):
            have = have.split()
        if any(c not in have for c in comp.classes):
            return False
    for name, op, value in comp.attrs:
        if not _attr_matches(el, name, op, value):
            return False
    for name, arg in comp.pseudos:
        if not _pseudo_matches(el, name, arg):
            return False
    return True


def _chain_matches(el: Element, sel: Selector, i: int, scope: Element) -> bool:
    comb, comp = sel[i]
    if not _compound_matches(el, comp):
        return False
    if i == 0:
        if comb == " ":
            return True  # scope is an ancestor by construction of candidates
        if comb == ">":
            return el.parent is scope
        return False
    prev_i = i - 1
    if comb == ">":
        return el.parent is not None and _chain_matches(el.parent, sel, prev_i, scope)
    if comb == " ":
        anc = el.parent
        while anc is not None:
            if _chain_matches(anc, sel, prev_i, scope):
                return True
            anc = anc.parent
        return False
    # sibling combinators
    parent = el.parent
    if parent is None:
        return False
    sibs = parent.element_children()
    idx = sibs.index(el)
    if comb == "+":
        return idx > 0 and _chain_matches(sibs[idx - 1], sel, prev_i, scope)
    if comb == "~":
        return any(_chain_matches(s, sel, prev_i, scope) for s in sibs[:idx])
    return False


def select(scope: Element, selector: str) -> List[Element]:
    groups = compile_selector(selector)
    if len(groups) == 1:
        # fast path: pre-filter candidates on the rightmost compound's
        # tag — skips the full chain matcher for the vast majority of
        # elements when the selector is tag-anchored (the common case
        # in extraction rules)
        sel = groups[0]
        last_i = len(sel) - 1
        tag = sel[last_i][1].type
        if tag and tag != "*":
            lower = tag.lower()  # XML keeps case; HTML tags are lowercased
            return [
                el
                for el in scope.iter_elements()
                if (el.tag == tag or el.tag == lower)
                and _chain_matches(el, sel, last_i, scope)
            ]
        return [
            el for el in scope.iter_elements() if _chain_matches(el, sel, last_i, scope)
        ]
    out: List[Element] = []
    for el in scope.iter_elements():
        if any(_chain_matches(el, sel, len(sel) - 1, scope) for sel in groups):
            out.append(el)
    return out


def select_one(scope: Element, selector: str) -> Optional[Element]:
    groups = compile_selector(selector)
    for el in scope.iter_elements():
        if any(_chain_matches(el, sel, len(sel) - 1, scope) for sel in groups):
            return el
    return None
