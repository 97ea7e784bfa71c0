"""Pure-Python reference-semantics crawler over an in-memory page store.

Implements exactly the recursive flow of the reference
``Crawler.crawl`` (/root/reference/uniparser/crawler.py:156-189):
resolve rule → fetch → parse → recurse into ``__request__`` leaves,
attaching ordered ``__result__`` lists.  The thread-pool fan-out there
preserves task submission order (``task.result()`` in list order), so a
sequential walk is order-identical.

Two deliberate extensions per the north rule (absent in the reference):
- a URL-seen set with memoization: a URL is crawled once; later
  references attach the memoized result;
- the store replaces live HTTP — a missing page is an error value.

This is the oracle the Spark BFS engine is compared against: identical
nested results and identical seen-set membership for the same seeds.
"""

from __future__ import annotations

from typing import Dict, Optional

from .. import config
from ..chains import run_rule
from ..exceptions import RuleNotFoundError
from ..rules import JSONRuleStorage
from ..urls import canonicalize_url, ensure_request


def simulate_crawl(
    storage: JSONRuleStorage,
    pages: Dict[str, str],
    request,
    seen: Optional[Dict[str, object]] = None,
    max_depth: int = 100,
    _depth: int = 0,
):
    """Crawl one seed; returns the nested result (or an error value).

    ``seen`` maps canonical URL -> memoized result and doubles as the
    membership set; pass a shared dict to crawl several seeds under one
    seen-set.
    """
    if not request:
        return None
    request_args = ensure_request(request)
    url = request_args["url"]
    canon = canonicalize_url(url)
    if seen is None:
        seen = {}
    if canon in seen:
        return seen[canon]
    if _depth > max_depth:
        return None
    seen[canon] = None  # mark before recursion (engine marks at schedule time)
    crawler_rule = storage.find_crawler_rule(url)
    if not crawler_rule:
        result = RuleNotFoundError(f"No rule matched the given url: {url}")
        seen[canon] = result
        return result
    body = pages.get(url)
    if body is None:
        result = KeyError(f"page store miss: {url}")
        seen[canon] = result
        return result
    context = {"request_args": {"method": crawler_rule["request_args"].get("method", "get"), "url": url}, "url": url}
    result = run_rule(body, crawler_rule, context=context)
    payload = result[crawler_rule["name"]]
    requests = payload.get(config.REQUEST_KEY)
    if requests:
        if isinstance(requests, (list, tuple)):
            payload[config.RESULT_KEY] = [
                simulate_crawl(storage, pages, child, seen=seen, max_depth=max_depth, _depth=_depth + 1)
                for child in requests
            ]
        else:
            payload[config.RESULT_KEY] = simulate_crawl(
                storage, pages, requests, seen=seen, max_depth=max_depth, _depth=_depth + 1
            )
    seen[canon] = result
    return result
