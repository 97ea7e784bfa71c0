"""HTML parsing to the mini-DOM, built on stdlib ``html.parser``.

Behavioral contract: the golden values of the reference CSS/selectolax
parser tests (/root/reference/test_parsers.py:170-305) — attribute
order preserved from source, comments kept as nodes, ``.text`` skips
comments, implied end tags for the common block/table/list cases.
"""

from __future__ import annotations

import os
from html.parser import HTMLParser as _StdHTMLParser
from typing import List, Optional, Tuple

from . import fasthtml
from .nodes import Comment, Element, Text

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# Starting one of these while a <p> is the innermost open element
# implicitly closes the <p> (HTML5 parsing rules, common subset).
_P_CLOSING = frozenset(
    "address article aside blockquote details div dl fieldset figcaption "
    "figure footer form h1 h2 h3 h4 h5 h6 header hr main menu nav ol p "
    "pre section table ul".split()
)

# tag -> set of sibling tags whose start implies this tag's end
_SIBLING_CLOSERS = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dt", "dd"}),
    "td": frozenset({"td", "th", "tr"}),
    "th": frozenset({"td", "th", "tr"}),
    "tr": frozenset({"tr"}),
    "option": frozenset({"option"}),
}


class HtmlElement(Element):
    __slots__ = ()
    VOID = VOID_ELEMENTS
    LIST_ATTRS = frozenset({"class", "rel", "accept-charset"})


class HtmlDocument(HtmlElement):
    """Root container; serializes as its children only."""

    __slots__ = ()

    def serialize(self) -> str:
        return self.inner()


class _TreeBuilder:
    """Parser-agnostic DOM builder: both the fast scanner tokenizer
    (dom.fasthtml) and the stdlib bridge drive these callbacks."""

    def __init__(self):
        self.root = HtmlDocument("[document]")
        self.stack: List[HtmlElement] = [self.root]

    @property
    def top(self) -> HtmlElement:
        return self.stack[-1]

    def _implied_end(self, tag: str) -> None:
        cur = self.top.tag
        if tag in _P_CLOSING and cur == "p":
            self.stack.pop()
        else:
            closers = _SIBLING_CLOSERS.get(cur)
            if closers and tag in closers:
                self.stack.pop()

    def handle_starttag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]):
        self._implied_end(tag)
        # both tokenizers hand over a freshly built attrs list — owned here
        el = HtmlElement(tag, attrs)
        self.stack[-1].append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]):
        self._implied_end(tag)
        self.stack[-1].append(HtmlElement(tag, attrs))

    def handle_endtag(self, tag: str):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignored

    def handle_data(self, data: str):
        self.top.append(Text(data))

    def handle_comment(self, data: str):
        self.top.append(Comment(data))


class _StdBridge(_StdHTMLParser):
    """stdlib tokenizer → builder callbacks (the reference engine for
    the parity tests; also the fallback via UNIPARSER_SPARK_HTML_ENGINE=std)."""

    def __init__(self, builder: _TreeBuilder):
        super().__init__(convert_charrefs=True)
        self._b = builder

    def handle_starttag(self, tag, attrs):
        self._b.handle_starttag(tag, attrs)

    def handle_startendtag(self, tag, attrs):
        self._b.handle_startendtag(tag, attrs)

    def handle_endtag(self, tag):
        self._b.handle_endtag(tag)

    def handle_data(self, data):
        self._b.handle_data(data)

    def handle_comment(self, data):
        self._b.handle_comment(data)


def parse_html(markup: str, engine: Optional[str] = None) -> HtmlDocument:
    """markup → DOM.  engine: 'fast' (default; scanner tokenizer,
    ~4× faster and allocation-light) or 'std' (stdlib html.parser —
    the behavioral reference the fast engine is parity-tested against).
    """
    if engine is None:
        engine = os.environ.get("UNIPARSER_SPARK_HTML_ENGINE", "fast")
    builder = _TreeBuilder()
    if engine == "std":
        bridge = _StdBridge(builder)
        bridge.feed(markup)
        bridge.close()
    else:
        fasthtml.feed(markup, builder)
    return builder.root
