"""XML parsing to the mini-DOM.

Behavioral contract: the reference XML parser golden values
(/root/reference/test_parsers.py:308-355), i.e. bs4 with the lxml-xml
feature set as observed there:

- tag names keep their case but drop namespace prefixes
  (``dc:creator`` selects as ``creator``; serialized without prefix);
- CDATA sections become plain text (re-escaped on serialization);
- XML declarations / processing instructions / doctypes are skipped;
- attribute values keep source order; text escaping is minimal
  (& < > only — quotes inside text stay raw).
"""

from __future__ import annotations

import re
from html import unescape
from typing import List, Optional, Tuple

from .nodes import Element, Text

_MARKUP = re.compile(
    r"""
    <!\[CDATA\[(?P<cdata>.*?)\]\]>
  | <!--(?P<comment>.*?)-->
  | <\?(?P<pi>.*?)\?>
  | <!(?P<decl>[^>]*)>
  | </(?P<endtag>[^>\s]+)\s*>
  | <(?P<starttag>[^>\s/]+)(?P<attrs>[^>]*?)(?P<selfclose>/?)>
    """,
    re.VERBOSE | re.DOTALL,
)

_ATTR = re.compile(r"""([-:\w]+)\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)""")


def _local_name(tag: str) -> str:
    return tag.rsplit(":", 1)[-1]


class XmlElement(Element):
    __slots__ = ()
    VOID = frozenset()  # XML has no void list; empty elements self-close

    def serialize(self) -> str:
        if not self.children:
            return f"<{self._start_tag()}/>"
        return super().serialize()


class XmlDocument(XmlElement):
    __slots__ = ()

    def serialize(self) -> str:
        return self.inner()


def _parse_attrs(raw: str) -> List[Tuple[str, Optional[str]]]:
    attrs: List[Tuple[str, Optional[str]]] = []
    for m in _ATTR.finditer(raw):
        name, val = m.group(1), m.group(2)
        if val and val[0] in "\"'" and val[-1] == val[0]:
            val = val[1:-1]
        attrs.append((name, unescape(val)))
    return attrs


def parse_xml(markup: str) -> XmlDocument:
    root = XmlDocument("[document]")
    stack: List[XmlElement] = [root]
    pos = 0
    n = len(markup)
    while pos < n:
        m = _MARKUP.search(markup, pos)
        if m is None:
            tail = markup[pos:]
            if tail:
                stack[-1].append(Text(unescape(tail)))
            break
        if m.start() > pos:
            stack[-1].append(Text(unescape(markup[pos : m.start()])))
        pos = m.end()
        if m.group("cdata") is not None:
            stack[-1].append(Text(m.group("cdata")))
        elif m.group("endtag") is not None:
            name = _local_name(m.group("endtag"))
            for i in range(len(stack) - 1, 0, -1):
                if stack[i].tag == name:
                    del stack[i:]
                    break
        elif m.group("starttag") is not None:
            el = XmlElement(_local_name(m.group("starttag")), _parse_attrs(m.group("attrs")))
            stack[-1].append(el)
            if not m.group("selfclose"):
                stack.append(el)
        # comment / pi / decl: dropped, matching the observed reference output
    return root
