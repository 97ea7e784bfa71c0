"""XPath-subset engine + operator tests.

The reference's xml parser is CSS-based ("not support `xpath` for
now", reference parsers.py:336); the xpath operator goes beyond the
reference to cover the north-star rule language (CSS / XPath / regex /
JSONPath chains).  Expected values below are hand-derived from the
XPath 1.0 spec (lxml semantics) — in particular the per-context
positional predicate (`//li[1]` = first li of EVERY parent) and
node-set comparisons (true when ANY node matches).
"""

import pytest

from uniparser_spark.dom import parse_html, parse_xml
from uniparser_spark.dom.xpath import UnsupportedXPathError, xpath_select
from uniparser_spark.operators import apply_operator as op

HTML = """<html><body>
<div id="a"><ul>
 <li class="x"><a href="/1">one</a></li>
 <li><a href="/2">two</a></li>
 <li class="x hot"><a href="/3">three</a></li>
</ul></div>
<div id="b"><ul>
 <li><a href="/4">four</a></li>
 <li><a href="/5">five</a></li>
</ul></div>
<p lang="en">hello <b>world</b></p>
<p>plain</p>
</body></html>"""


@pytest.fixture(scope="module")
def dom():
    return parse_html(HTML)


def strs(dom, path):
    return [
        n if isinstance(n, str) else n.text for n in xpath_select(dom, path)
    ]


def test_descendant_and_attribute_steps(dom):
    assert strs(dom, "//a/@href") == ["/1", "/2", "/3", "/4", "/5"]
    assert strs(dom, "//*[@id]/@id") == ["a", "b"]
    # absolute and explicit-axis forms
    assert strs(dom, "/html/body/div[@id='b']//a/@href") == ["/4", "/5"]
    assert strs(dom, "//li/child::a/attribute::href") == ["/1", "/2", "/3", "/4", "/5"]


def test_positional_predicates_are_per_context(dom):
    # XPath 1.0: //li[1] = first li child of EVERY parent, not the
    # first li in the document
    assert strs(dom, "//li[1]/a/@href") == ["/1", "/4"]
    assert strs(dom, "//li[last()]/a/@href") == ["/3", "/5"]
    assert strs(dom, "//div[1]/ul/li[position()>=2]/a/@href") == ["/2", "/3"]
    # sequential predicates renumber: second li of the x-classed ones
    assert strs(dom, "//li[@class][2]/a/@href") == ["/3"]


def test_value_predicates(dom):
    assert strs(dom, "//li[@class='x']/a/text()") == ["one"]
    assert strs(dom, "//li[contains(@class,'hot')]/a/@href") == ["/3"]
    assert strs(dom, "//a[starts-with(@href,'/1')]/text()") == ["one"]
    assert strs(dom, "//li[not(@class)]/a/@href") == ["/2", "/4", "/5"]
    assert strs(dom, "//li[@class and a]/a/@href") == ["/1", "/3"]
    # node-set comparison: any matching child
    assert strs(dom, "//p[b]/@lang") == ["en"]
    assert strs(dom, "//p[b='world']/text()") == ["hello "]
    assert strs(dom, "//li/a[.='two']/@href") == ["/2"]


def test_text_parent_self_union(dom):
    assert strs(dom, "//p/text()") == ["hello ", "plain"]
    assert strs(dom, "./html/body/p/b/text()") == ["world"]
    parents = xpath_select(dom, "//b/..")
    assert [p.tag for p in parents] == ["p"]
    # union keeps first-occurrence document order and dedups
    assert strs(dom, "//ul/li[2]/a/@href | //p[2]/text() | //ul/li[2]/a/@href") == [
        "/2",
        "/5",
        "plain",
    ]


def test_star_and_node_tests(dom):
    tags = [e.tag for e in xpath_select(dom, "/html/body/*")]
    assert tags == ["div", "div", "p", "p"]
    # node() includes text children
    kinds = xpath_select(dom, "//p[1]/node()")
    assert kinds[0] == "hello " and kinds[1].tag == "b"


def test_unsupported_constructs_are_named(dom):
    for path, frag in [
        ("count(//a)", "function count"),
        ("//a/following::b", "axis following"),
        ("//a[translate(@href,'a','b')]", "function"),
        ("//a | ", "union"),
        ("//@href/x", "step after"),
    ]:
        with pytest.raises(UnsupportedXPathError) as ei:
            xpath_select(dom, path)
        assert frag.split()[-1] in str(ei.value)


def test_xpath_over_xml_document():
    xml = (
        '<?xml version="1.0"?><rss><channel>'
        "<item><title>t1</title><link>l1</link></item>"
        "<item><title>t2</title><link>l2</link></item>"
        "</channel></rss>"
    )
    dom = parse_xml(xml)
    assert strs(dom, "//item/title/text()") == ["t1", "t2"]
    assert strs(dom, "//item[title='t2']/link/text()") == ["l2"]


def test_operator_wiring_and_value_ops():
    # string results pass through; element results take css-style value ops
    assert op("xpath", HTML, "//li[1]/a/@href", "") == ["/1", "/4"]
    assert op("xpath", HTML, "//p[b]", "$text") == ["hello world"]
    assert op("xpath", HTML, "//p[2]", "$outerHTML") == ["<p>plain</p>"]
    assert op("xpath", HTML, "//li[last()]/a", "@href") == ["/3", "/5"]
    # XML sniffing on the <?xml prelude
    xml = '<?xml version="1.0"?><r><v k="1">a</v><v k="2">b</v></r>'
    assert op("xpath", xml, "//v/@k", "") == ["1", "2"]
    # list recursion (reference _RECURSION_LIST semantics)
    two = [HTML, HTML]
    assert op("xpath", two, "//p[2]/text()", "") == [["plain"], ["plain"]]
    # empty input short-circuits like css
    assert op("xpath", "", "//a", "") == []
    # errors are data at the chain layer
    err = op("xpath", HTML, "count(//a)", "")
    assert isinstance(err, UnsupportedXPathError)


def test_operator_accepts_dom_element_input():
    dom = parse_html(HTML)
    div_b = xpath_select(dom, "//div[@id='b']")[0]
    assert op("xpath", div_b, ".//a/@href", "") == ["/4", "/5"]


TABLE = """<table>
<tr><th>k1</th><td>v1</td><td> v1b </td></tr>
<tr><th>k2</th><td>v2</td></tr>
</table>
<div><p id="x">a</p><p>b</p><span>c</span><p>d</p></div>"""


@pytest.fixture(scope="module")
def tdom():
    return parse_html(TABLE)


def tstrs(tdom, path):
    return [
        n if isinstance(n, str) else n.text for n in xpath_select(tdom, path)
    ]


def test_sibling_axes(tdom):
    # the canonical scraping shape: label cell -> value cell
    assert tstrs(tdom, "//th[.='k1']/following-sibling::td") == ["v1", " v1b "]
    # [1] is per-context: nearest following td of EVERY th
    assert tstrs(tdom, "//th/following-sibling::td[1]") == ["v1", "v2"]
    # preceding-sibling is a reverse axis: [1] = NEAREST preceding
    assert tstrs(tdom, "//span/preceding-sibling::p[1]") == ["b"]
    # ...but unpredicated node-sets surface in document order (lxml)
    assert tstrs(tdom, "//span/preceding-sibling::p") == ["a", "b"]
    assert tstrs(tdom, "//span/following-sibling::*") == ["d"]
    assert tstrs(tdom, "//td[.='v2']/preceding-sibling::th") == ["k2"]


def test_ancestor_descendant_axes(tdom):
    # ancestor::* excludes the synthetic [document] root (not an element)
    assert [e.tag for e in xpath_select(tdom, "//td/ancestor::*")] == [
        "table", "tr", "tr",
    ]
    assert [e.tag for e in xpath_select(tdom, "//td[.='v2']/ancestor-or-self::*")] == [
        "table", "tr", "td",
    ]
    # reverse-axis positions: ancestor[1] is the nearest (the tr)
    assert [e.tag for e in xpath_select(tdom, "//td[.='v2']/ancestor::*[1]")] == ["tr"]
    assert tstrs(tdom, "//div/descendant::p") == ["a", "b", "d"]
    assert tstrs(tdom, "/descendant-or-self::span") == ["c"]
    # explicit self axis with a tag test filters the context node
    assert tstrs(tdom, "//p/self::p[@id]") == ["a"]
    assert tstrs(tdom, "//p/parent::div/span") == ["c"]


def test_normalize_space(tdom):
    assert tstrs(tdom, "//td[normalize-space(.)='v1b']") == [" v1b "]
    assert tstrs(tdom, "//td[normalize-space()='v1b']") == [" v1b "]
    # exists-form: boolean(string) is true iff non-empty
    assert tstrs(tdom, "//td[normalize-space(.)]") == ["v1", " v1b ", "v2"]
