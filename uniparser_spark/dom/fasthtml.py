"""Scanner-based HTML tokenizer — a drop-in replacement for stdlib
``html.parser`` tokenization, ~3-5× faster and far lighter on
allocations (which is what limits multi-core scaling of the extraction
UDF: DOM parse is memory-bandwidth-bound at high worker counts).

Produces the exact same callback stream as ``html.parser.HTMLParser``
with ``convert_charrefs=True`` for the engine's behavioral corpus:
lowercased tag/attr names, entity-unescaped text and attribute values,
raw-text (CDATA) handling for script/style, comments, bogus markup
treated leniently.  Parity with the stdlib engine is pinned by
tests/test_dom_parity.py over the golden fixtures, the synthetic
corpus, and adversarial edge strings.
"""

from __future__ import annotations

import re
from html import unescape

_TAG_RE = re.compile(
    r"<([a-zA-Z][-.:0-9a-zA-Z]*)"  # tag name
    r"((?:\s+[^\s/>=]+(?:\s*=\s*(?:\"[^\"]*\"|'[^']*'|[^\s>]*))?)*)"  # attrs
    r"\s*(/?)\s*>"
)
_ATTR_RE = re.compile(
    r"([^\s/>=]+)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?"
)
_END_RE = re.compile(r"</\s*([a-zA-Z][-.:_0-9a-zA-Z]*)\s*>")
_TOLERANT_NAME = re.compile(r"([a-zA-Z][-.:_0-9a-zA-Z]*)")

# script/style content is raw text: scan for the closing tag literally
_RAW_END = {
    tag: re.compile(rf"</\s*{tag}(?=[\s/>])|</\s*{tag}\s*>", re.IGNORECASE)
    for tag in ("script", "style")
}

# stdlib allows whitespace between the closing dashes and '>'
_COMMENT_CLOSE = re.compile(r"--\s*>")


class MarkedSectionSafe:
    """Never-crash marked sections for stdlib-bridge parsers.

    CPython's ``_markupbase.parse_marked_section`` raises
    ``AssertionError`` on ``<![`` followed by no valid section name
    (e.g. ``<![0``, real-web garbage) and ``NotImplementedError`` on
    unknown keywords — both would turn a malformed page into a
    parse-time crash instead of a tree.  Override with the SAME rule
    the fast tokenizer uses: consume to the next ``]>`` emitting
    nothing (stdlib's unknown_decl is a no-op anyway), and drop an
    unterminated section at EOF.  This also removes a latent
    divergence: stdlib matched the looser ``]\\s*]\\s*>`` close, so
    ``<![CDATA[a]>b]]>`` ended at a different offset than the fast
    engine's ``]>`` scan."""

    def parse_marked_section(self, i: int, report: int = 1) -> int:
        rawdata = self.rawdata
        j = rawdata.find("]>", i + 3)
        if j < 0:
            return len(rawdata)  # unterminated at EOF: drop
        return j + 2


def _std_tail(tail: str, builder) -> None:
    """Unterminated construct at EOF: hand the tail to the stdlib
    tokenizer so every EOF flush quirk matches exactly.  Runs at most
    once per document, on (usually tiny) trailing garbage."""
    from html.parser import HTMLParser

    class _Bridge(MarkedSectionSafe, HTMLParser):
        def handle_starttag(self, tag, attrs):
            builder.handle_starttag(tag, attrs)

        def handle_startendtag(self, tag, attrs):
            builder.handle_startendtag(tag, attrs)

        def handle_endtag(self, tag):
            builder.handle_endtag(tag)

        def handle_data(self, data):
            builder.handle_data(data)

        def handle_comment(self, data):
            builder.handle_comment(data)

    bridge = _Bridge(convert_charrefs=True)
    bridge.feed(tail)
    bridge.close()


def feed(markup: str, builder) -> None:
    """Drive ``builder`` (handle_starttag/handle_startendtag/
    handle_endtag/handle_data/handle_comment) over ``markup``."""
    handle_start = builder.handle_starttag
    handle_startend = builder.handle_startendtag
    handle_end = builder.handle_endtag
    handle_data = builder.handle_data
    handle_comment = builder.handle_comment
    find = markup.find
    i, n = 0, len(markup)
    while i < n:
        lt = find("<", i)
        if lt < 0:
            text = markup[i:]
            handle_data(unescape(text) if "&" in text else text)
            break
        if lt > i:
            text = markup[i:lt]
            handle_data(unescape(text) if "&" in text else text)
        nxt = markup[lt + 1] if lt + 1 < n else ""
        if nxt == "!":
            if markup.startswith("<!--", lt):
                m = _COMMENT_CLOSE.search(markup, lt + 4)
                if m is None:
                    _std_tail(markup[lt:], builder)
                    break
                handle_comment(markup[lt + 4 : m.start()])
                i = m.end()
            elif markup[lt : lt + 9].lower() == "<!doctype":
                gt = find(">", lt)  # declaration: skipped (no decl handler)
                if gt < 0:
                    _std_tail(markup[lt:], builder)
                    break
                i = gt + 1
            elif markup.startswith("<![", lt):
                end = find("]>", lt + 3)  # marked section: unknown_decl → ignored
                if end < 0:
                    _std_tail(markup[lt:], builder)
                    break
                i = end + 2
            else:  # anything else after '<!' is a bogus comment (stdlib)
                gt = find(">", lt)
                if gt < 0:
                    _std_tail(markup[lt:], builder)
                    break
                handle_comment(markup[lt + 2 : gt])
                i = gt + 1
        elif nxt == "/":
            m = _END_RE.match(markup, lt)
            if m:
                handle_end(m.group(1).lower())
                i = m.end()
            elif markup[lt : lt + 3] == "</>":
                i = lt + 3  # stdlib: empty end tag is ignored
            else:
                gt = find(">", lt)
                if gt < 0:
                    _std_tail(markup[lt:], builder)
                    break
                nm = _TOLERANT_NAME.match(markup, lt + 2)
                if nm:  # '</x junk>': tolerant-name end tag (stdlib)
                    handle_end(nm.group(1).lower())
                    gt2 = find(">", nm.end())
                    i = n if gt2 < 0 else gt2 + 1
                else:  # bogus end tag: stdlib emits a bogus comment
                    handle_comment(markup[lt + 2 : gt])
                    i = gt + 1
        elif nxt == "?":
            gt = find(">", lt)  # processing instruction: skipped
            if gt < 0:
                _std_tail(markup[lt:], builder)
                break
            i = gt + 1
        else:
            m = _TAG_RE.match(markup, lt)
            if m is None:
                if nxt.isalpha():
                    # incomplete or oddly-formed start tag: let stdlib
                    # handle the remainder so its quirks match exactly
                    _std_tail(markup[lt:], builder)
                    break
                # '<' followed by non-letter: literal text (stdlib)
                handle_data("<")
                i = lt + 1
                continue
            tag = m.group(1).lower()
            attrs_src = m.group(2)
            attrs = []
            if attrs_src:
                for am in _ATTR_RE.finditer(attrs_src):
                    name = am.group(1).lower()
                    if am.group(2) is not None:
                        value = am.group(2)
                    elif am.group(3) is not None:
                        value = am.group(3)
                    else:
                        value = am.group(4)
                    if value is not None and "&" in value:
                        value = unescape(value)
                    attrs.append((name, value))
            i = m.end()
            if m.group(3):
                handle_startend(tag, attrs)
            else:
                handle_start(tag, attrs)
                raw_end = _RAW_END.get(tag)
                if raw_end is not None:
                    em = raw_end.search(markup, i)
                    if em is None:
                        # stdlib drops unterminated raw-text content
                        break
                    if em.start() > i:
                        handle_data(markup[i : em.start()])  # raw: no unescape
                    endm = _END_RE.match(markup, em.start())
                    if endm:
                        handle_end(endm.group(1).lower())
                        i = endm.end()
                    else:
                        gt = find(">", em.start())
                        handle_end(tag)
                        i = n if gt < 0 else gt + 1
