"""Rule model: ParseRule / CrawlerRule / HostRule / JSONRuleStorage.

Rules are plain dicts (JSON trees) — the engine's logical plan.  The
serialized key order is part of the contract: the reference test suite
byte-compares ``dumps`` output (/root/reference/test_parsers.py:839-842,
897-900, 1023-1025), so constructors normalize key order exactly as the
reference does (parsers.py:1038-1237, crawler.py:47-126):

- ParseRule:   name, chain_rules, child_rules, <extra kwargs>,
  iter_parse_child (only when truthy)
- CrawlerRule: name, parse_rules, request_args, regex, <extra kwargs>
- HostRule:    host, crawler_rules

``context`` is carried as an instance attribute (shared mutable state
for udf steps), never serialized.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Dict, List, Optional, Union

from . import config
from .urls import ensure_request, get_host


class RuleDict(dict):
    """dict with JSON (de)serialization helpers (reference
    JsonSerializable, parsers.py:1006-1035)."""

    __slots__ = ()

    def to_dict(self) -> dict:
        return dict(self)

    def dumps(self, *args, **kwargs) -> str:
        return config.json_dumps(self.to_dict(), *args, **kwargs)

    to_json = dumps

    @classmethod
    def loads(cls, source: Union[str, dict, "RuleDict"]) -> "RuleDict":
        if isinstance(source, cls):
            return source
        if isinstance(source, str):
            return cls(**config.json_loads(source))
        if isinstance(source, dict):
            return cls(**source)
        raise TypeError("Only can be loaded from JSON / cls / dict.")

    from_json = loads


class ParseRule(RuleDict):
    __slots__ = ("context",)

    def __init__(
        self,
        name: str,
        chain_rules: Optional[List[List]] = None,
        child_rules: Optional[List[dict]] = None,
        context: Optional[dict] = None,
        iter_parse_child: bool = False,
        **extra,
    ):
        super().__init__()
        self.context = config.new_context() if context is None else context
        self["name"] = name
        self["chain_rules"] = [list(triple) for triple in (chain_rules or [])]
        self["child_rules"] = [
            ParseRule(context=self.context, **child) if not isinstance(child, ParseRule) else child
            for child in (child_rules or [])
        ]
        self.update(extra)
        if iter_parse_child:
            self["iter_parse_child"] = iter_parse_child


class CrawlerRule(RuleDict):
    __slots__ = ("context",)

    #: default URL-match strategy (reference parsers.py:1134)
    CHECK_STRATEGY = "match"

    def __init__(
        self,
        name: str,
        request_args: Union[dict, str, None] = None,
        parse_rules: Optional[List[dict]] = None,
        regex: Optional[str] = None,
        context: Optional[dict] = None,
        **extra,
    ):
        super().__init__()
        self.context = config.new_context() if context is None else context
        self["name"] = name
        self["parse_rules"] = [
            pr if isinstance(pr, ParseRule) else ParseRule(context=self.context, **pr)
            for pr in (parse_rules or [])
        ]
        self["request_args"] = ensure_request(request_args)
        self["regex"] = regex or ""
        self.update(extra)

    # -- request assembly (reference parsers.py:1156-1163) -------------
    def get_request(self, **overrides) -> dict:
        if not overrides:
            return self["request_args"]
        merged = dict(overrides)
        for k, v in json.loads(json.dumps(self["request_args"])).items():
            merged.setdefault(k, v)
        return merged

    # -- parse-rule management ------------------------------------------
    def add_parse_rule(self, rule: dict, context: Optional[dict] = None) -> None:
        self["parse_rules"].append(ParseRule(context=context or self.context, **rule))

    def pop_parse_rule(self, index: int, default=None):
        try:
            return self["parse_rules"].pop(index)
        except IndexError:
            return default

    def clear_parse_rules(self) -> None:
        self["parse_rules"].clear()

    # -- URL dispatch ----------------------------------------------------
    def search(self, url: str) -> bool:
        return not self["regex"] or bool(re.compile(self["regex"]).search(url))

    def match(self, url: str) -> bool:
        return not self["regex"] or bool(re.compile(self["regex"]).match(url))

    def check_regex(self, url: str, strategy: str = "") -> bool:
        return getattr(self, strategy or self.CHECK_STRATEGY)(url)


class HostRule(RuleDict):
    __slots__ = ()

    def __init__(self, host: str, crawler_rules: Optional[Dict[str, dict]] = None, **extra):
        super().__init__()
        self["host"] = host
        self["crawler_rules"] = {
            cr["name"]: cr if isinstance(cr, CrawlerRule) else CrawlerRule(**cr)
            for cr in (crawler_rules or {}).values()
        }
        self.update(extra)

    def findall(self, url: str, strategy: str = "") -> List[CrawlerRule]:
        return [r for r in self["crawler_rules"].values() if r.check_regex(url, strategy)]

    def find(self, url: str, strategy: str = "") -> Optional[CrawlerRule]:
        rules = self.findall(url, strategy=strategy)
        if len(rules) > 1:
            raise ValueError(f"{url} matched more than 1 rule. {rules}")
        return rules[0] if rules else None

    def search(self, url: str) -> Optional[CrawlerRule]:
        return self.find(url, "search")

    def match(self, url: str) -> Optional[CrawlerRule]:
        return self.find(url, "match")

    def add_crawler_rule(self, rule: Union[CrawlerRule, str, dict]) -> None:
        if not isinstance(rule, CrawlerRule):
            rule = CrawlerRule.loads(rule)
        self["crawler_rules"][rule["name"]] = rule
        try:
            rule_url = rule["request_args"]["url"]
            if get_host(rule_url) != self["host"]:
                raise AssertionError(
                    f'different host: {self["host"]} not match {rule_url}'
                )
            if not (self.match(rule_url) or self.search(rule_url)):
                raise AssertionError(
                    f'regex {rule["regex"]} not match the given url: {rule_url}'
                )
        except (ValueError, KeyError, AssertionError):
            self["crawler_rules"].pop(rule["name"], None)
            raise

    def pop_crawler_rule(self, rule_name: str) -> Optional[CrawlerRule]:
        return self["crawler_rules"].pop(rule_name, None)


class JSONRuleStorage(RuleDict):
    """{host: HostRule} persisted to a single JSON file (reference
    crawler.py:47-126).  Unlike the reference, the default is file-less
    (hermetic); pass ``file_path`` to persist."""

    __slots__ = ("file_path",)

    def __init__(self, file_path: Optional[Union[str, Path]] = None, **host_rules):
        super().__init__()
        self.file_path = Path(file_path) if file_path else None
        if self.file_path and self.file_path.is_file():
            content = self.file_path.read_text()
            if content:
                for host, host_rule in config.json_loads(content).items():
                    self[host] = HostRule(**host_rule)
        for host, host_rule in host_rules.items():
            self[host] = host_rule if isinstance(host_rule, HostRule) else HostRule(**host_rule)
        self.commit()

    def commit(self) -> None:
        if self.file_path:
            self.file_path.write_text(config.json_dumps(self))

    def find_crawler_rule(self, url: str, method: str = "find") -> Optional[CrawlerRule]:
        host_rule = self.get(get_host(url))
        if not host_rule:
            return None
        return getattr(host_rule, method)(url)

    def add_crawler_rule(self, rule: CrawlerRule, commit: bool = False) -> bool:
        url = rule.get("request_args", {}).get("url")
        host = get_host(url)
        if not host:
            return False
        host_rule = self.setdefault(host, HostRule(host))
        host_rule.add_crawler_rule(rule)
        if commit:
            self.commit()
        return True

    def pop_crawler_rule(self, rule: CrawlerRule, commit: bool = False):
        host = get_host(rule["request_args"].get("url"))
        for host_rule in ([self.get(host)] if host else list(self.values())):
            if host_rule:
                popped = host_rule.pop_crawler_rule(rule["name"])
                if commit:
                    self.commit()
                return popped
        return None

    def add_host_rule(self, rule: HostRule, commit: bool = False) -> None:
        self[rule["host"]] = rule
        if commit:
            self.commit()

    def pop_host_rule(self, host: str, commit: bool = False):
        rule = self.pop(host, None)
        if commit:
            self.commit()
        return rule
