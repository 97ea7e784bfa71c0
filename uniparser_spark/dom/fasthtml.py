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
_END_RE = re.compile(r"</\s*([a-zA-Z][-.:0-9a-zA-Z]*)\s*>")

# script/style content is raw text: scan for the closing tag literally
_RAW_END = {
    tag: re.compile(rf"</\s*{tag}(?=[\s/>])|</\s*{tag}\s*>", re.IGNORECASE)
    for tag in ("script", "style")
}


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
                end = find("-->", lt + 4)
                if end < 0:
                    # stdlib EOF behavior: incomplete markup flushes as
                    # text, '<' separately
                    handle_data("<")
                    handle_data(markup[lt + 1 :])
                    break
                handle_comment(markup[lt + 4 : end])
                i = end + 3
            else:  # doctype / declaration: skipped (builder has no decl handler)
                gt = find(">", lt)
                i = n if gt < 0 else gt + 1
        elif nxt == "/":
            m = _END_RE.match(markup, lt)
            if m:
                handle_end(m.group(1).lower())
                i = m.end()
            else:  # bogus end tag: stdlib emits a bogus comment
                gt = find(">", lt)
                if gt < 0:
                    handle_data(markup[lt:])
                    break
                handle_comment(markup[lt + 2 : gt])
                i = gt + 1
        elif nxt == "?":
            gt = find(">", lt)  # processing instruction: skipped
            i = n if gt < 0 else gt + 1
        else:
            m = _TAG_RE.match(markup, lt)
            if m is None:
                # lone '<' or malformed start: lenient, '<' becomes text
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
