"""Layer-2 golden tests: rule serialization byte-equality and the
rule-tree executor (/root/reference/test_parsers.py:808-1053,
1386-1413), adapted to be hermetic (no network: the JSON fixture stands
in for the downloaded body)."""

import pytest

from uniparser_spark import (
    CrawlerRule,
    HostRule,
    InvalidSchemaError,
    JSONRuleStorage,
    ParseRule,
    ensure_request,
    fix_relative_path,
    run_chain,
    run_rule,
)

from fixtures import HTML


def test_crawler_rule_serialization():
    crawler_rule = CrawlerRule(
        "test",
        {"url": "http://httpbin.org/get", "method": "get"},
        [
            {
                "name": "rule1",
                "chain_rules": [
                    ["objectpath", "JSON.url", ""],
                    ["python", "getitem", "[:4]"],
                    ["udf", '(context["resp"].url, context["request_args"]["url"], input_object)', ""],
                ],
                "child_rules": [],
            }
        ],
        "",
    )
    expected = (
        r'{"name": "test", "parse_rules": [{"name": "rule1", "chain_rules": '
        r'[["objectpath", "JSON.url", ""], ["python", "getitem", "[:4]"], '
        r'["udf", "(context[\"resp\"].url, context[\"request_args\"][\"url\"], input_object)", ""]], '
        r'"child_rules": []}], "request_args": {"url": "http://httpbin.org/get", "method": "get"}, "regex": ""}'
    )
    assert crawler_rule.to_json() == expected
    assert crawler_rule.to_dict() == {
        "name": "test",
        "parse_rules": [
            {
                "name": "rule1",
                "chain_rules": [
                    ["objectpath", "JSON.url", ""],
                    ["python", "getitem", "[:4]"],
                    ["udf", '(context["resp"].url, context["request_args"]["url"], input_object)', ""],
                ],
                "child_rules": [],
            }
        ],
        "request_args": {"url": "http://httpbin.org/get", "method": "get"},
        "regex": "",
    }
    # extra keys are serialized after the canonical ones
    crawler_rule["context"] = {"a": 1, "b": {"c": 2}}
    assert list(crawler_rule.keys())[-1] == "context"


def test_host_rule_validation():
    host_rule = HostRule("importpython.com")
    bad = (
        '{"name":"C-1583501370","request_args":{"method":"get","url":"https://importpython.com/blog/feed/"},'
        '"parse_rules":[{"name":"text","chain_rules":[["xml","channel>item>title","$text"],'
        '["python","getitem","[0]"]],"childs":""}],"regex":"https://bad_url_host.com/blog/feed/$"}'
    )
    with pytest.raises(AssertionError):
        host_rule.add_crawler_rule(bad)
    assert host_rule["crawler_rules"] == {}
    rule = CrawlerRule.loads(bad)
    rule["regex"] = r"https?://importpython\.com/.*"
    host_rule.add_crawler_rule(rule)
    assert host_rule["crawler_rules"]
    assert not host_rule.findall("https://bad_url_host.com/")
    assert host_rule.findall("https://importpython.com/")


def test_host_rule_storage_roundtrip():
    crawler_rule = CrawlerRule(
        "test_crawler_rule",
        {"url": "http://httpbin.org/get", "method": "get"},
        [
            {
                "name": "rule1",
                "chain_rules": [
                    ["objectpath", "JSON.url", ""],
                    ["python", "getitem", "[:4]"],
                    ["udf", '(context["resp"].url, input_object)', ""],
                ],
                "child_rules": [],
            }
        ],
        "https?://httpbin.org/get",
    )
    host_rule = HostRule(host="httpbin.org")
    host_rule.add_crawler_rule(crawler_rule)
    expected = (
        r'{"host": "httpbin.org", "crawler_rules": {"test_crawler_rule": {"name": "test_crawler_rule", '
        r'"parse_rules": [{"name": "rule1", "chain_rules": [["objectpath", "JSON.url", ""], '
        r'["python", "getitem", "[:4]"], ["udf", "(context[\"resp\"].url, input_object)", ""]], '
        r'"child_rules": []}], "request_args": {"url": "http://httpbin.org/get", "method": "get"}, '
        r'"regex": "https?://httpbin.org/get"}}}'
    )
    assert host_rule.dumps() == expected
    # reload from JSON and dispatch by url
    reloaded = HostRule.loads(expected)
    found = reloaded.search("http://httpbin.org/get")
    assert found == reloaded.match("http://httpbin.org/get")
    assert isinstance(found, CrawlerRule)
    assert reloaded.search("http://notmatch.com") is None


def test_parse_rule_roundtrip_and_nesting():
    rule1 = ParseRule(
        "rule1",
        [["python", "getitem", "[:7]"], ["udf", 'str(input_object)+" "+context["key"]', ""]],
        [],
    )
    result = run_rule(HTML, rule1, {"key": "hello world"})
    assert result == {"rule1": "\n<html> hello world"}
    json_string = (
        r'{"name": "rule1", "chain_rules": [["python", "getitem", "[:7]"], '
        r'["udf", "str(input_object)+\" \"+context[\"key\"]", ""]], "child_rules": []}'
    )
    assert rule1.dumps() == rule1.to_json() == json_string
    loaded = ParseRule.from_json(json_string)
    assert isinstance(loaded, ParseRule)
    assert loaded == ParseRule.loads(json_string)

    rule1["child_rules"].append(ParseRule("rule2", [["udf", "input_object[::-1]", ""]], []))
    rule1["child_rules"].append(
        ParseRule(
            "rule3",
            [["udf", "input_object[::-1]", ""]],
            [ParseRule("rule4", [["udf", "input_object[::-1]", ""]], [])],
        )
    )
    parse_rule = ParseRule(
        "parse_rule",
        [
            ["css", "p", "$outerHTML"],
            ["css", "b", "$text"],
            ["python", "getitem", "[0]"],
            ["python", "getitem", "[0]"],
        ],
        child_rules=[rule1],
    )
    result = run_rule(HTML, parse_rule, {"key": "hello world"})
    assert result == {
        "parse_rule": {"rule1": {"rule2": "dlrow olleh si sihT", "rule3": {"rule4": "This is hello world"}}}
    }

    crawler_rule = CrawlerRule("crawler_rule", "http://example.com", [parse_rule], "")
    result = run_rule(HTML, crawler_rule, {"key": "hello world"})
    assert result == {
        "crawler_rule": {
            "parse_rule": {"rule1": {"rule2": "dlrow olleh si sihT", "rule3": {"rule4": "This is hello world"}}}
        }
    }
    json_string = (
        r'{"name": "crawler_rule", "parse_rules": [{"name": "parse_rule", "chain_rules": '
        r'[["css", "p", "$outerHTML"], ["css", "b", "$text"], ["python", "getitem", "[0]"], '
        r'["python", "getitem", "[0]"]], "child_rules": [{"name": "rule1", "chain_rules": '
        r'[["python", "getitem", "[:7]"], ["udf", "str(input_object)+\" \"+context[\"key\"]", ""]], '
        r'"child_rules": [{"name": "rule2", "chain_rules": [["udf", "input_object[::-1]", ""]], '
        r'"child_rules": []}, {"name": "rule3", "chain_rules": [["udf", "input_object[::-1]", ""]], '
        r'"child_rules": [{"name": "rule4", "chain_rules": [["udf", "input_object[::-1]", ""]], '
        r'"child_rules": []}]}]}]}], "request_args": {"method": "get", "url": "http://example.com"}, "regex": ""}'
    )
    assert crawler_rule.dumps() == crawler_rule.to_json() == json_string
    loaded = CrawlerRule.from_json(json_string)
    assert CrawlerRule.loads(json_string) == loaded == crawler_rule
    assert isinstance(loaded["parse_rules"][0], ParseRule)


def test_iter_parse_child():
    parse_rule = ParseRule(
        "test_iter_parse",
        [["python", "const", ""]],
        iter_parse_child=True,
        child_rules=[ParseRule("child", [["udf", "input_object * 2", ""]])],
    )
    assert run_rule([1, 2, 3], parse_rule) == {
        "test_iter_parse": [{"child": 2}, {"child": 4}, {"child": 6}]
    }
    parse_rule = ParseRule(
        "test_iter_parse",
        [["python", "const", ""]],
        child_rules=[ParseRule("child", [["udf", "input_object * 2", ""]])],
    )
    assert run_rule([1, 2, 3], parse_rule) == {"test_iter_parse": {"child": [1, 2, 3, 1, 2, 3]}}


def test_parse_result_in_context():
    crawler_rule = CrawlerRule.loads(
        r'{"name":"HelloWorld","request_args":{"method":"get","url":"http://httpbin.org/get"},'
        r'"parse_rules":[{"name":"rule1","chain_rules":[["objectpath","$.url",""]],"child_rules":[],'
        '"iter_parse_child":false},{"name":"rule2","chain_rules":[["udf","context[\'parse_result\'][\'rule1\']",""]],'
        r'"child_rules":[],"iter_parse_child":false}],"regex":"http://httpbin.org/get$"}'
    )
    body = '{"url": "http://httpbin.org/get"}'
    result = run_rule(body, crawler_rule)
    assert result == {"HelloWorld": {"rule1": "http://httpbin.org/get", "rule2": "http://httpbin.org/get"}}


def test_schema_and_parse_callback():
    def parse_callback(rule, result, context):
        return rule["name"] == "A" and result == {"A": "a"}

    result = run_rule("A", ParseRule("A", [["udf", "obj.lower()", ""]]), parse_callback=parse_callback)
    assert result
    with pytest.raises(InvalidSchemaError):
        # schema-named rule must yield True
        run_rule("A", ParseRule("__schema__", [["udf", "obj.lower()", ""]]))


def test_context_operator_in_chain():
    assert run_rule(HTML, ParseRule("parse_rule", [["context", "key", "not found"]]), {"key": "hello world"}) == {
        "parse_rule": "hello world"
    }
    assert run_rule(HTML, ParseRule("parse_rule", [["context", "key_not_exist", "not found"]]), {"key": "x"}) == {
        "parse_rule": "not found"
    }


def test_shared_context_mutation():
    crawler_rule = CrawlerRule(
        "test_crawler_rule",
        {"url": "http://httpbin.org/get", "method": "get"},
        [],
        "https?://httpbin.org/get",
    )
    new_parse = "\ndef parse(input_object):\n    context['new_key'] = 'cleared'\n    return 'ok'\n    "
    crawler_rule.context.update({"new_key": "new_value"})
    crawler_rule.add_parse_rule(
        {
            "name": "rule1",
            "chain_rules": [["objectpath", "JSON.url", ""], ["python", "getitem", "[:4]"], ["udf", new_parse, ""]],
            "child_rules": [],
        }
    )
    result = run_rule('{"url": "http://httpbin.org/get"}', crawler_rule)
    assert result == {"test_crawler_rule": {"rule1": "ok"}}
    assert crawler_rule.context["new_key"] == "cleared"


def test_object_rebinding():
    crawler_rule = CrawlerRule(
        "crawler_rule",
        "http://example.com",
        [
            ParseRule("old", [["py", "", ""]]),
            ParseRule("__object__", [["py", "", "new"]]),
            ParseRule("new", [["py", "", ""]]),
        ],
        "",
    )
    result = run_rule(HTML, crawler_rule)["crawler_rule"]
    assert "<html>" in result["old"]
    assert result["new"] == "new"


def test_input_callback():
    crawler_rule = CrawlerRule(
        "test_input_callback",
        {"url": "http://httpbin.org/get", "method": "get"},
        [
            {
                "name": "rule1",
                "chain_rules": [["objectpath", "JSON.url", ""], ["python", "getitem", "[:4]"]],
                "child_rules": [],
            }
        ],
        "https?://httpbin.org/get",
        input_callback="json",
    )
    assert crawler_rule["input_callback"] == "json"
    result = run_rule('{"url": "http://httpbin.org/get"}', crawler_rule)
    assert result == {"test_input_callback": {"rule1": "http"}}


def test_fix_relative_path():
    html = (
        '<a href="/b">test</a><a href="./b">test</a><a href="../b">test</a><a href="../../b">test</a>'
        '<img src="/b"><img src="./b"><img src="../b"><img src="../../b">'
    )
    base_url = "http://www.abc.com/a/b/c/d/e?query=a#b"
    assert fix_relative_path(base_url, html) == (
        '<a href="http://www.abc.com/b">test</a><a href="http://www.abc.com/a/b/c/d/b">test</a>'
        '<a href="http://www.abc.com/a/b/c/b">test</a><a href="http://www.abc.com/a/b/b">test</a>'
        '<img src="http://www.abc.com/b"><img src="http://www.abc.com/a/b/c/d/b">'
        '<img src="http://www.abc.com/a/b/c/b"><img src="http://www.abc.com/a/b/b">'
    )
    # absolute URLs untouched, fast path returns input object
    absolute = '<a href="https://x.com/b">z</a>'
    assert fix_relative_path(base_url, absolute) is absolute


def test_ensure_request():
    assert ensure_request("http://test.com") == {"method": "get", "url": "http://test.com"}
    assert ensure_request({"method": "get", "url": "http://test.com"}) == {
        "method": "get",
        "url": "http://test.com",
    }
    assert ensure_request({"url": "http://test.com"}) == {"url": "http://test.com", "method": "get"}
    assert ensure_request("curl http://test.com") == {"url": "http://test.com", "method": "get"}
    curl = "curl 'https://p.3.cn?skuIds=1' -H 'Pragma: no-cache' -H 'Cookie: A=B' --compressed"
    parsed = ensure_request(curl)
    assert parsed["url"] == "https://p.3.cn?skuIds=1"
    assert parsed["headers"]["Pragma"] == "no-cache"
    assert parsed["headers"]["Cookie"] == "A=B"
    assert parsed["method"] == "get"
    assert ensure_request("{}") == {}
    assert ensure_request('{"url": "http://x.com", "method": "POST"}') == {
        "url": "http://x.com",
        "method": "post",
    }


def test_json_rule_storage(tmp_path):
    storage = JSONRuleStorage(file_path=tmp_path / "rules.json")
    crawler_rule = CrawlerRule(
        "r1",
        {"url": "http://httpbin.org/get", "method": "get"},
        [{"name": "rule1", "chain_rules": [["objectpath", "JSON.url", ""]], "child_rules": []}],
        "https?://httpbin.org/get",
    )
    assert storage.add_crawler_rule(crawler_rule, commit=True)
    again = JSONRuleStorage(file_path=tmp_path / "rules.json")
    assert again["httpbin.org"]
    found = again.find_crawler_rule("http://httpbin.org/get")
    assert found["name"] == "r1"
    assert again.find_crawler_rule("http://nope.org/") is None
    assert again.pop_crawler_rule(crawler_rule)["name"] == "r1"
