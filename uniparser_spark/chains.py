"""Rule-tree execution: chain folding, nested parse rules, crawler rules.

Re-implements the reference executor semantics
(/root/reference/uniparser/parsers.py:1305-1393) as plain functions the
Spark engine fuses into one pandas UDF per page:

- ``run_chain``: left-fold through [parser, param, value] triples;
  the ``context`` operator swaps the input for the context dict, a
  ``udf`` step with an empty value receives the live context.
- ``run_parse_rule``: chain → ``__schema__`` assert → child recursion
  (``iter_parse_child`` maps children over each element).
- ``run_crawler_rule``: ordered fold over parse_rules with a live
  ``parse_result`` view in context and ``__object__`` input rebinding.
- ``input_callback``: parse-once DOM/JSON sharing per page
  (reference utils.py:745-803) — the key intra-page CSE.

Awaitable chain outputs (async udf `parse`) are resolved with a private
event loop, mirroring aparse's ensure_await_result
(parsers.py:1422-1429).
"""

from __future__ import annotations

import asyncio
import inspect
from typing import Any, Callable, Dict, List, Optional

from . import config
from .dom import parse_html, parse_xml
from .exceptions import InvalidSchemaError
from .operators import apply_operator

ParseCallback = Callable[[dict, dict, dict], dict]


def _resolve_awaitable(result: Any) -> Any:
    if inspect.isawaitable(result):
        try:
            return asyncio.run(_await(result))
        except config.SYSTEM_ERRORS:
            raise
        except Exception as err:  # noqa: BLE001
            return err
    return result


async def _await(coro: Any) -> Any:
    return await coro


def run_chain(obj: Any, chain_rules: List[List], context: Optional[dict] = None) -> Any:
    context = config.new_context() if context is None else context
    for name, param, value in chain_rules:
        if name == "context":
            obj = context
        elif context and name == "udf" and not value:
            value = context
        obj = apply_operator(name, obj, param, value)
    return _resolve_awaitable(obj)


def run_parse_rule(
    obj: Any,
    rule: dict,
    context: Optional[dict] = None,
    parse_callback: Optional[ParseCallback] = None,
) -> Dict[str, Any]:
    if context is None:
        context = getattr(rule, "context", None) or config.new_context()
    name = rule["name"]
    obj = run_chain(obj, rule.get("chain_rules") or [], context=context)
    if name == config.SCHEMA_KEY and obj is not True:
        raise InvalidSchemaError(f"Schema check is not True: {repr(obj)[:50]}")
    child_rules = rule.get("child_rules") or []
    if child_rules:
        result: Dict[str, Any] = {name: {}}
        if rule.get("iter_parse_child", False):
            items = []
            for element in obj:
                items.append(
                    {
                        sub["name"]: run_parse_rule(
                            element, sub, context=context, parse_callback=parse_callback
                        ).get(sub["name"])
                        for sub in child_rules
                    }
                )
            result[name] = items
        else:
            result[name] = {
                sub["name"]: run_parse_rule(
                    obj, sub, context=context, parse_callback=parse_callback
                ).get(sub["name"])
                for sub in child_rules
            }
    else:
        result = {name: obj}
    if parse_callback:
        return parse_callback(rule, result, context)
    return result


def run_crawler_rule(
    obj: Any,
    rule: dict,
    context: Optional[dict] = None,
    parse_callback: Optional[ParseCallback] = None,
) -> Dict[str, Any]:
    if context is None:
        context = getattr(rule, "context", None) or config.new_context()
    parse_result: Dict[str, Any] = {}
    context.setdefault("request_args", rule.get("request_args"))
    context.setdefault("req", context["request_args"])
    context["parse_result"] = parse_result
    current = obj
    for parse_rule in rule.get("parse_rules") or []:
        piece = run_parse_rule(
            current, parse_rule, context=context, parse_callback=parse_callback
        ).get(parse_rule["name"])
        if parse_rule["name"] == config.OBJECT_KEY:
            current = piece
        parse_result[parse_rule["name"]] = piece
    context.pop("parse_result", None)
    return {rule["name"]: parse_result}


# --------------------------------------------------------- input callbacks

INPUT_CALLBACKS: Dict[str, Callable[[Any, dict], Any]] = {
    "json": lambda text, context: config.json_loads(text),
    "se": lambda text, context: parse_html(text),
    "selectolax": lambda text, context: parse_html(text),
    "css": lambda text, context: parse_html(text),
    "html": lambda text, context: parse_html(text),
    "xml": lambda text, context: parse_xml(text),
}


def apply_input_callback(text: Any, context: dict, callback_name: Optional[str]) -> Any:
    fn = INPUT_CALLBACKS.get(callback_name)
    if fn is None:
        return text
    try:
        return fn(text, context)
    except Exception:  # noqa: BLE001 - fall back to raw text (utils.py:777-784)
        return text


def run_rule(
    obj: Any,
    rule_object: dict,
    context: Optional[dict] = None,
    parse_callback: Optional[ParseCallback] = None,
) -> Dict[str, Any]:
    """Dispatch on rule shape: CrawlerRule has parse_rules, ParseRule has
    chain_rules (reference type-dispatches on class, parsers.py:1374-1393)."""
    if context is None:
        context = getattr(rule_object, "context", None) or config.new_context()
    if "parse_rules" in rule_object:
        obj = apply_input_callback(obj, context, rule_object.get("input_callback"))
        return run_crawler_rule(obj, rule_object, context=context, parse_callback=parse_callback)
    if "chain_rules" in rule_object:
        return run_parse_rule(obj, rule_object, context=context, parse_callback=parse_callback)
    raise TypeError("rule_object must be a CrawlerRule or ParseRule mapping")
