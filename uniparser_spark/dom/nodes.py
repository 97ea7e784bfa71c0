"""Lightweight DOM node types shared by the HTML and XML engines.

Pure Python, stdlib only (bs4/lxml/selectolax are unavailable in this
environment).  The observable behavior — selection order, text
extraction, inner/outer serialization, source attribute order — matches
what the reference engine's parsers produce on its golden test corpus
(/root/reference/test_parsers.py:170-355).
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Tuple


def escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


class Text:
    __slots__ = ("data", "parent")

    def __init__(self, data: str, parent: Optional["Element"] = None):
        self.data = data
        self.parent = parent

    def serialize(self) -> str:
        return escape_text(self.data)

    def __repr__(self) -> str:  # pragma: no cover
        return f"Text({self.data!r})"


class Comment:
    __slots__ = ("data", "parent")

    def __init__(self, data: str, parent: Optional["Element"] = None):
        self.data = data
        self.parent = parent

    def serialize(self) -> str:
        return f"<!--{self.data}-->"

    def __repr__(self) -> str:  # pragma: no cover
        return f"Comment({self.data!r})"


class Element:
    """An element node.  ``attrs`` preserves source order as a list of
    (name, value) pairs; ``value`` may be None for bare attributes."""

    __slots__ = ("tag", "attrs", "children", "parent")

    #: element names serialized as void / self-closing (overridden by HTML)
    VOID: frozenset = frozenset()
    #: whether multi-valued attributes (class) are exposed as lists (bs4 html)
    LIST_ATTRS: frozenset = frozenset()

    def __init__(self, tag: str, attrs: Optional[List[Tuple[str, Optional[str]]]] = None):
        self.tag = tag
        self.attrs = attrs or []
        self.children: list = []
        self.parent: Optional[Element] = None

    # -- tree building -------------------------------------------------
    def append(self, node) -> None:
        node.parent = self
        self.children.append(node)

    # -- attribute access ----------------------------------------------
    def get(self, name: str, default=None):
        for k, v in self.attrs:
            if k == name:
                v = "" if v is None else v
                if name in self.LIST_ATTRS:
                    return v.split()
                return v
        return default

    @property
    def attributes(self) -> dict:
        """selectolax-style flat dict of attributes."""
        return {k: ("" if v is None else v) for k, v in self.attrs}

    # -- traversal -------------------------------------------------------
    def iter_elements(self) -> Iterator["Element"]:
        """All descendant elements in document (pre) order, self excluded.
        Iterative DFS: a recursive generator costs one suspended frame
        per tree level per yield, which showed up as ~8% of extraction
        CPU on 20 KB pages."""
        stack = self.children[::-1]
        pop = stack.pop
        while stack:
            node = pop()
            if isinstance(node, Element):
                yield node
                if node.children:
                    stack.extend(node.children[::-1])

    def element_children(self) -> List["Element"]:
        return [c for c in self.children if isinstance(c, Element)]

    # -- text ------------------------------------------------------------
    @property
    def text(self) -> str:
        """Concatenation of all descendant text nodes (comments excluded),
        matching bs4 ``Tag.text`` / selectolax ``Node.text()``."""
        out: List[str] = []
        self._collect_text(out)
        return "".join(out)

    def _collect_text(self, out: List[str]) -> None:
        for child in self.children:
            if isinstance(child, Text):
                out.append(child.data)
            elif isinstance(child, Element):
                child._collect_text(out)

    # -- serialization -----------------------------------------------------
    def _start_tag(self) -> str:
        parts = [self.tag]
        for k, v in self.attrs:
            parts.append(f'{k}="{escape_attr("" if v is None else v)}"')
        return " ".join(parts)

    def inner(self) -> str:
        """Serialization of children (bs4 ``decode_contents()``)."""
        return "".join(c.serialize() for c in self.children)

    def serialize(self) -> str:
        if self.tag in self.VOID:
            return f"<{self._start_tag()}/>"
        return f"<{self._start_tag()}>{self.inner()}</{self.tag}>"

    def __str__(self) -> str:
        return self.serialize()

    def __repr__(self) -> str:  # pragma: no cover
        return f"<{type(self).__name__} {self.tag}>"

    # -- selection (wired up by dom.css to avoid a circular import) -------
    def select(self, selector: str) -> List["Element"]:
        from . import css

        return css.select(self, selector)

    def select_one(self, selector: str) -> Optional["Element"]:
        from . import css

        return css.select_one(self, selector)
