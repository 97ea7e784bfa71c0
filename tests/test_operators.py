"""Layer-1 golden tests: every operator against the reference corpus's
hardcoded expected values (/root/reference/test_parsers.py:159-805).
"""

import pytest

from uniparser_spark import operators
from uniparser_spark.dom.nodes import Element
from uniparser_spark.operators import apply_operator as op

from fixtures import HTML, JSON, TOML, XML, YAML


def test_context_operator():
    assert op("context", {"a": 1}, "a", 2) == 1
    assert op("context", {"a": 1}, "b", 2) == 2


def test_css_operator():
    assert op("css", HTML, "a", "@href") == [None, "http://example.com/2", "http://example.com/3"]
    assert op("css", HTML, "a.a", "$text") == ["", "a2", "a3"]
    assert op("css", HTML, "a", "$innerHTML") == ["<!--invisible comment-->", "a2", "a3"]
    assert op("css", HTML, "a", "$html") == ["<!--invisible comment-->", "a2", "a3"]
    outer = [
        '<a class="a" id="link1"><!--invisible comment--></a>',
        '<a class="a" href="http://example.com/2" id="link2">a2</a>',
        '<a class="a" href="http://example.com/3" id="link3">a3</a>',
    ]
    assert op("css", HTML, "a", "$outerHTML") == outer
    assert op("css", HTML, "a", "$string") == outer
    result = op("css", HTML, "a", "$self")
    assert all(isinstance(i, Element) for i in result)
    # re-parsing a node object
    tag = op("css", HTML, "p.body", "$self")[0]
    assert op("css", tag, "a", "$text") == ["", "a2", "a3"]
    # list recursion
    tags = op("css", HTML, "div", "$self")
    assert op("css", tags, "span", "$text") == [["d1"], ["d2"]]


def test_css1_operator():
    one = '<a class="url" href="/">title</a>'
    assert op("css1", one, "a.url1", "@href") is None
    assert op("css1", one, "a.url", "@href") == "/"
    assert op("css1", one, "a.url", "$text") == "title"
    assert op("css1", one, "a.url", "$innerHTML") == "title"
    assert op("css1", one, "a.url", "$html") == "title"
    assert op("css1", one, "a.url", "$outerHTML") == one
    assert op("css1", one, "a.url", "$string") == one
    assert isinstance(op("css1", one, "a.url", "$self"), Element)


def test_selectolax_operator():
    assert op("se", HTML, "a", "@href") == [None, "http://example.com/2", "http://example.com/3"]
    assert op("se", HTML, "a.a", "$text") == ["", "a2", "a3"]
    outer = [
        '<a class="a" id="link1"><!--invisible comment--></a>',
        '<a class="a" href="http://example.com/2" id="link2">a2</a>',
        '<a class="a" href="http://example.com/3" id="link3">a3</a>',
    ]
    assert op("se", HTML, "a", "$outerHTML") == outer
    assert op("se", HTML, "a", "$string") == outer
    assert all(isinstance(i, Element) for i in op("se", HTML, "a", "$self"))
    tag = op("se", HTML, "p.body", "$self")[0]
    assert op("se", tag, "a", "$text") == ["", "a2", "a3"]
    tags = op("se", HTML, "div", "$self")
    assert op("se", tags, "span", "$text") == [["d1"], ["d2"]]


def test_se1_operator():
    one = '<a class="url" href="/">title</a>'
    assert op("se1", one, "a.url1", "@href") == ""
    assert op("se1", one, "a.url", "@href") == "/"
    assert op("se1", one, "a.url", "$text") == "title"
    assert op("se1", one, "a.url", "$string") == one
    assert op("se1", one, "a.url", "$outerHTML") == one
    assert isinstance(op("se1", one, "a.url", "$self"), Element)
    assert op("se1", one, "a.url", "$html") == "title"
    assert op("se1", one, "a.url", "$innerHTML") == "title"


def test_xml_operator():
    assert op("xml", XML, "link", "@href") == ["https://www.example.com/feed/", None, None, None]
    assert op("xml", XML, "creator", "$text") == [
        "\n                creator\n            ",
        "\n                creator\n            ",
    ]
    assert op("xml", XML, "description", "$innerXML") == [
        "XML example",
        "\n                 description \n            ",
        "\n                 description \n            ",
    ]
    encoded = (
        '<encoded>\n                 &lt;p&gt;&lt;a href="https://example.com" class="home"&gt;'
        "homepage&lt;/a&gt; some words &lt;/p&gt;\n            </encoded>"
    )
    assert op("xml", XML, "encoded", "$outerXML") == [encoded, encoded]
    assert all(isinstance(i, Element) for i in op("xml", XML, "link", "$self"))
    tag = op("xml", XML, "item", "$self")[0]
    assert op("xml", tag, "title", "$text") == ["This is a title"]
    tags = op("xml", XML, "item", "$self")
    assert op("xml", tags, "title", "$text") == [["This is a title"], ["This is a title2"]]


def test_re_operator():
    assert op("re", HTML, 'class="a"', "") == ['class="a"'] * 3
    assert op("re", HTML, 'class="(.*?)"', "") == ["title", "body", "a", "a", "a", "body"]
    assert op("re", HTML, 'class="(a)"', "$0") == ['class="a"'] * 3
    assert op("re", HTML, 'class="(a)"', "$1") == ["a", "a", "a"]
    result = op("re", HTML, "<a.*</a>", "")
    result = op("re", result, 'class="(a)"', r'@class="\1 b"')
    assert result == [
        '<a class="a b" id="link1"><!--invisible comment--></a>',
        '<a class="a b" href="http://example.com/2" id="link2">a2</a>',
        '<a class="a b" href="http://example.com/3" id="link3">a3</a>',
    ]
    assert op("re", "a\t \nb  c", r"\s+", "-") == ["a", "b", "c"]
    assert op("re", "a\t \nb  c", r"(\s+)", "#1") == "\t \n"
    assert op("re", "a\t \nb  c", r"b(\s+)", "#0") == "b  "
    # docstring cases (parsers.py:424-437)
    assert op("re", "a a b b c c", "a|c", "@b") == "b b b b b b"
    assert op("re", "abcd", "(b.)d", "#0") == "bcd"
    assert op("re", "abcd", "(b.)", "#1") == "bc"
    assert op("re", "abcd", "(b.)", "#2") == ""
    assert op("re", "abcd", ".(?:d)", "#0") == "cd"
    assert op("re", "abcd", ".(?:d)", "#1") == ""
    assert op("re", "abcd", ".(?<=c).", "#0") == "cd"
    assert op("re", "abcd", ".(?<=c).", "#1") == ""


def test_jsonpath_operator():
    assert op("jsonpath", JSON, "firstName", "") == ["John"]
    assert op("jsonpath", JSON, "firstName", "$value") == ["John"]
    assert op("jsonpath", JSON, "$.address.city", "") == ["Nara"]
    assert op("jsonpath", JSON, "$.phoneNums[1:]", "") == [
        {"type": "home", "number": "0123-4567-8910"}
    ]
    assert op("jsonpath", JSON, "$.prices[?(@.price > 1)]", "") == [{"price": 2}, {"price": 3}]
    assert op("jsonpath", JSON, '$.phoneNums[?(@.type = "iPhone")]', "") == [
        {"type": "iPhone", "number": "0123-4567-8888"}
    ]
    assert str(op("jsonpath", JSON, "firstName", "$full_path")) == "[Fields('firstName')]"
    assert op("jsonpath", {"a": {"b": {"c": 1}}}, "$..c", "") == [1]


def test_objectpath_operator():
    assert op("objectpath", JSON, "$.firstName", "") == "John"
    assert op("objectpath", JSON, "$.address.city", "") == "Nara"
    assert op("objectpath", JSON, "$.prices[@.price > 1]", "") == [{"price": 2}, {"price": 3}]
    assert op("objectpath", JSON, '$.phoneNums[@.type is "iPhone"]', "") == [
        {"type": "iPhone", "number": "0123-4567-8888"}
    ]
    assert op("objectpath", {"a": {"b": {"c": 1}}}, "$..c", "") == [1]


def test_jmespath_operator():
    assert op("json", JSON, "firstName", "") == "John"
    assert op("jmespath", JSON, "firstName", "") == "John"
    assert op("jmespath", JSON, "address.city", "") == "Nara"
    assert op("jmespath", JSON, "prices[1].price", "") == 2
    assert op("jmespath", JSON, "prices[1:3].price", "") == [2, 3]
    assert op("jmespath", JSON, "phoneNums[?type == 'iPhone'].number", "") == ["0123-4567-8888"]
    assert op("jmespath", JSON, "prices[?price > `1`].price", "") == [2, 3]


def test_python_operator():
    assert op("python", [1, 2, 3], "getitem", "[-1]") == 3
    assert op("python", [1, 2, 3], "get", "[-1]") == 3
    assert op("python", [1, 2, 3], "getitem", "[:2]") == [1, 2]
    assert op("python", [1, 2, 3, 4, 5], "getitem", "[1::2]") == [2, 4]
    assert op("python", {"a": "1"}, "getitem", "a") == "1"
    missing = op("python", {"a": "1"}, "getitem", "b")
    assert str(missing) == "'b'" and isinstance(missing, KeyError)
    assert op("python", "a b\tc \n \td", "split", "") == ["a", "b", "c", "d"]
    assert op("python", "asbscsd", "split", "s") == ["a", "b", "c", "d"]
    assert op("python", ["a", "b", "c", "d"], "join", "") == "abcd"
    assert op("python", ["a", "b", "c", "d"], "const", "") == ["a", "b", "c", "d"]
    assert op("python", ["a", "b", "c", "d"], "const", "abcd") == "abcd"
    assert op("python", ["a", "b", "c", "d"], "template", "1 $input_object 2") == "1 ['a', 'b', 'c', 'd'] 2"
    assert op("python", {"a": "aaaa", "b": "bbbb"}, "template", "$a + $b = ?") == "aaaa + bbbb = ?"
    assert op("python", ["a", "b", "c", "d"], "index", "-1") == "d"
    assert op("python", {"a": 1}, "index", "a") == 1
    assert op("python", ["a", "b", ["c", "d"]], "chain", "") == ["a", "b", "c", "d"]
    assert op("python", ["aaa", ["b"], ["c", "d"]], "chain", "") == ["a", "a", "a", "b", "c", "d"]
    assert op("python", "adcb", "sort", "") == ["a", "b", "c", "d"]
    assert op("python", [1, 3, 2, 4], "sort", "desc") == [4, 3, 2, 1]
    assert op("python", "aabbcc", "strip", "ac") == "bb"
    assert op("python", "  bb\t\n", "strip", "") == "bb"
    assert op("python", "  \t\n", "default", "default") == "default"
    assert op("python", "", "default", "default") == "default"
    assert op("python", "a", "default", "default") == "a"
    assert op("python", "abc", "base64_encode", "") == "YWJj"
    assert op("python", "YWJj", "base64_decode", "") == "abc"
    assert op("python", "a", "0", "b") == "a"
    assert op("python", "", "0", "b") == "b"
    assert op("python", None, "0", "b") == "b"
    assert op("python", {0: "a"}, "0", "a") == "a"
    assert op("python", ["a"], "0", "b") == "a"
    assert op("python", "a", "", "abc") == "abc"


def test_udf_operator():
    context = {"a": 1}
    assert op("udf", "abcd", "open", context) is NotImplemented
    assert op("udf", "abcd", "input", context) is NotImplemented
    assert op("udf", "abcd", "input_object", context) is not NotImplemented
    assert op("udf", "abcd", "exec", context) is NotImplemented
    assert op("udf", "abcd", "eval", context) is NotImplemented
    assert op("udf", "abcd", "context", context) == context
    assert op("udf", "abcd", 'context["a"]', '{"a": 1}') == 1
    assert op("udf", "abcd", "parse = lambda input_object: (input_object, context)", context) == ("abcd", context)
    scode = "\ndef parse(item):\n    return (item, context)\n"
    assert op("udf", "abcd", scode, context) == ("abcd", context)
    assert op("udf", JSON, "parse = lambda item: item.strip()[5:5+9]", "") == "firstName"
    assert op("udf", JSON, "def parse(item): return item.strip()[5:5+9]", "") == "firstName"
    scode = "\ndef parse(item):\n    import json\n    return json.loads(item)['firstName']\n"
    assert op("udf", JSON, scode, "") == "John"
    assert op("udf", "hello", 'input_object + " world."', "") == "hello world."
    assert op("udf", "hello", 'obj + " world."', "") == "hello world."
    assert op("udf", "", "abc", {"locals": {"abc": True}}) is True
    # async udf resolved through the chain executor (parsers.py:1422-1429)
    from uniparser_spark import run_chain

    result = run_chain("x", [["udf", "async def parse(obj):\n    return obj * 2", ""]], {})
    assert result == "xx"


def test_loader_operator():
    assert op("loader", YAML, "yaml", "") == {
        "user1": {"name": "a", "pwd": 123},
        "user2": {"name": "b", "pwd": 456},
    }
    assert op("loader", TOML, "toml", '{"decoder": null}') == {
        "title": "TOML Example",
        "owner": {"name": "ClericPy"},
        "example": {"ports": [8001, 8001, 8002], "connection_max": 5000, "enabled": True},
    }
    assert op("loader", JSON, "json", '{"parse_int": null}')["age"] == 26
    assert op("loader", "a", "b64encode", "") == "YQ=="
    assert op("loader", "YQ==", "b64decode", "") == "a"
    assert op("loader", op("loader", "a", "b16encode", ""), "b16decode", "") == "a"
    assert op("loader", op("loader", "a", "b32encode", ""), "b32decode", "") == "a"
    assert op("loader", op("loader", "a", "b85encode", ""), "b85decode", "") == "a"


def test_time_operator():
    timestamp = "1580732985.1873155"
    time_string = "2020-02-03 20:29:45"
    old_tz = operators.LOCAL_TIME_ZONE
    try:
        operators.LOCAL_TIME_ZONE = 8
        assert int(op("time", time_string, "encode", "")) == int(float(timestamp))
        assert op("time", timestamp, "decode", "") == time_string
        assert int(op("time", op("time", timestamp, "decode", ""), "encode", "")) == int(float(timestamp))
        assert int(op("time", "2020-02-03T20:29:45 +0000", "encode", "%Y-%m-%dT%H:%M:%S %z")) == int(float(timestamp))
        operators.LOCAL_TIME_ZONE += 1
        assert op("time", timestamp, "decode", "") > time_string
        assert op("time", time_string, "encode", "") - int(float(timestamp)) == -3600
    finally:
        operators.LOCAL_TIME_ZONE = old_tz


def test_md5_helper():
    assert operators.md5(1, 10) == "923820dcc5"
    assert operators.md5("test") == "098f6bcd4621d373cade4e832627b4f6"


def test_unknown_operator():
    from uniparser_spark.exceptions import UnknownParserNameError

    with pytest.raises(UnknownParserNameError):
        op("nope", "x", "y", "z")


def test_paths_unsupported_syntax_is_named():
    # beyond-subset constructs raise a clear UnsupportedPathError (which
    # the chain executor surfaces as an error value, never empty output)
    import pytest as _pytest

    from uniparser_spark.operators import apply_operator
    from uniparser_spark.paths import UnsupportedPathError, jsonpath_values

    for bad in ("$.a[b,c]", "$.a[(@.size * 2)]", "$..book[?(len(@.price) > 1)]"):
        with _pytest.raises(UnsupportedPathError, match="unsupported"):
            jsonpath_values({"a": [1, 2]}, bad)
    # error-as-data through the operator layer
    err = apply_operator("jsonpath", {"a": [1, 2]}, "$.a[(1+1)]", "")
    assert isinstance(err, UnsupportedPathError)


def test_paths_index_script():
    """[(@.length-1)] — the one arithmetic script jsonpath-rw-ext
    defines — resolves to len±N; out-of-range yields no match."""
    from uniparser_spark.paths import jsonpath_values, objectpath_execute

    data = {"a": [10, 20, 30]}
    assert jsonpath_values(data, "$.a[(@.length-1)]") == [30]
    assert jsonpath_values(data, "$.a[(@.length-3)]") == [10]
    assert jsonpath_values(data, "$.a[(@.length-9)]") == []  # oob
    assert jsonpath_values(data, "$.a[(@.length)]") == []    # oob (== len)
    assert objectpath_execute(data, "$.a[(@.length-2)]") == 20


def test_paths_filter_grammar():
    """Round-3 grammar gap closed: boolean connectives, negation,
    parenthesized groups, existence atoms, field-to-field comparison,
    and in/not-in list membership inside [?(...)] / [@...] filters."""
    from uniparser_spark.paths import jsonpath_values, objectpath_execute

    books = {
        "book": [
            {"id": 1, "price": 5, "cap": 10, "tag": "a", "sale": True},
            {"id": 2, "price": 15, "cap": 10, "tag": "b"},
            {"id": 3, "price": 25, "cap": 30, "tag": "c"},
        ]
    }

    def ids(path):
        return [b["id"] for b in jsonpath_values(books, path)]

    # existence / truthiness atom (jsonpath-rw-ext shape)
    assert ids("$.book[?(@.sale)]") == [1]
    # boolean connectives, both spellings, with precedence and > or
    assert ids("$.book[?(@.price > 10 & @.price < 20)]") == [2]
    assert ids("$.book[?(@.price > 10 and @.price < 20)]") == [2]
    assert ids("$.book[?(@.id == 1 | @.id == 3)]") == [1, 3]
    assert ids("$.book[?(@.sale or @.id == 2 and @.tag == 'b')]") == [1, 2]
    # parenthesized groups override precedence
    assert ids("$.book[?((@.sale or @.id == 2) and @.tag == 'b')]") == [2]
    # negation
    assert ids("$.book[?(not @.sale)]") == [2, 3]
    assert ids("$.book[?(!(@.id == 2))]") == [1, 3]
    # field-to-field comparison
    assert ids("$.book[?(@.price < @.cap)]") == [1, 3]
    # in / not in against list literals (bracket and paren forms)
    assert ids("$.book[?(@.id in [1, 3])]") == [1, 3]
    assert ids("$.book[?(@.tag in ('a', 'b'))]") == [1, 2]
    assert ids("$.book[?(@.id not in [1, 3])]") == [2]
    # scalar arrays filter through bare @
    assert jsonpath_values({"l": [1, 5, 9]}, "$.l[?(@ > 3)]") == [5, 9]
    # objectpath bracket filters share the grammar
    got = objectpath_execute(books, "$.book[@.sale | @.id == 3]")
    assert [b["id"] for b in got] == [1, 3]
    # missing keys compare False, never raise
    assert ids("$.book[?(@.nope > 1)]") == []
    assert ids("$.book[?(@.nope > 1 | @.id == 2)]") == [2]
    # =~ regex match (jsonpath-rw-ext): re.search semantics
    assert ids('$.book[?(@.tag =~ "a|c")]') == [1, 3]
    assert ids("$.book[?(@.tag =~ '^b$')]") == [2]
    assert ids('$.book[?(@.tag =~ "a" | @.price > 20)]') == [1, 3]
    # non-string operands never match (false, not error)
    assert ids('$.book[?(@.price =~ "1")]') == []
    assert ids('$.book[?(@.nope =~ "x")]') == []


def test_paths_unions_and_recursive_wildcard():
    """Round-2 grammar gap closed: quoted field unions, index unions,
    and the recursive wildcard (jsonpath-rw parity shapes)."""
    from uniparser_spark.paths import jsonpath_values, objectpath_execute

    data = {"a": {"b": [{"k": 1}, {"k": 2}], "k": 0}, "names": {"first": "ann", "last": "lee"}}
    assert jsonpath_values(data, "$.names['first','last']") == ["ann", "lee"]
    assert jsonpath_values(data, '$.names["last","first"]') == ["lee", "ann"]
    assert jsonpath_values(data, "$.a.b[1,0]") == [{"k": 2}, {"k": 1}]
    assert jsonpath_values(data, "$.a.b[0,9]") == [{"k": 1}]  # oob skipped
    assert jsonpath_values(data, "$..k") == [1, 2, 0]
    everything = jsonpath_values(data, "$..*")
    assert data["a"] in everything and "lee" in everything
    assert objectpath_execute(data, "$.names['first','last']") == ["ann", "lee"]


def test_paths_filter_arithmetic():
    """Session-4 grammar step: +/-/*//*%* arithmetic in filter operands
    (jsonpath-rw-ext script-expression shape), with errors-as-data."""
    from uniparser_spark.paths import jsonpath_values

    books = {
        "book": [
            {"id": 1, "price": 5, "qty": 4, "cap": 10, "tag": "a"},
            {"id": 2, "price": 15, "qty": 2, "cap": 10},
            {"id": 3, "price": 25, "qty": 0, "cap": 30},
        ]
    }

    def ids(path):
        return [b["id"] for b in jsonpath_values(books, path)]

    assert ids("$.book[?(@.price + 10 > 20)]") == [2, 3]
    assert ids("$.book[?(@.price - 10 > 0)]") == [2, 3]
    assert ids("$.book[?(@.price -10 > 0)]") == [2, 3]   # sign-bound spelling
    assert ids("$.book[?(@.price * @.qty >= 20)]") == [1, 2]
    assert ids("$.book[?(@.id % 2 == 1)]") == [1, 3]
    assert ids("$.book[?(@.price / 5 == 3)]") == [2]
    # precedence: * binds tighter than +
    assert ids("$.book[?(@.price + @.qty * 0 == 5)]") == [1]
    # field-to-field with arithmetic on both sides
    assert ids("$.book[?(@.price * 2 > @.cap + 5)]") == [2, 3]
    # errors-as-data: string+int and div-by-zero compare False, not raise
    assert ids("$.book[?(@.tag + 1 > 0)]") == []
    assert ids("$.book[?(@.price / @.qty > 1)]") == [1, 2]
    # missing field poisons the whole arithmetic term
    assert ids("$.book[?(@.nope + 1 > 0)]") == []
