"""URL helpers: host extraction, request normalization, relative-path
fixing, and the frontier's URL canonicalizer.

Reference behavior: utils.py:58-62 (get_host), utils.py:181-215
(ensure_request incl. curl strings), utils.py:707-726
(fix_relative_path).  ``canonicalize_url`` is frontier-only (the
reference matches exact strings, so canonicalization must be the
identity on reference inputs — SURVEY.md §2.3).
"""

from __future__ import annotations

import re
import shlex
from typing import Optional
from urllib.parse import urljoin, urlparse

from . import config


def get_host(url: Optional[str], default: Optional[str] = None) -> Optional[str]:
    if url and url.startswith("http"):
        return urlparse(url).netloc
    return default


# ----------------------------------------------------------- curl parsing

_CURL_HEADER_FLAGS = {"-H", "--header"}
_CURL_VALUE_FLAGS = {
    "-X": "method",
    "--request": "method",
    "-A": "user_agent",
    "--user-agent": "user_agent",
    "-e": "referer",
    "--referer": "referer",
    "-u": "auth",
    "--user": "auth",
    "-d": "data",
    "--data": "data",
    "--data-raw": "data",
    "--data-binary": "data",
    "-F": "data",
    "--form": "data",
    "--data-urlencode": "data",
    "--url": "url",
    "--connect-timeout": "connect_timeout",
    "-m": "max_time",
    "--max-time": "max_time",
    "--retry-max-time": "retry",
    "-x": "proxy",
    "--proxy": "proxy",
}
_CURL_BOOL_FLAGS = {"-I": "head", "--head": "head", "-L": "location", "--location": "location", "--compressed": "compressed"}


def curl_to_request(curl_string: str, encoding: str = "utf-8") -> dict:
    """Parse a curl command line into a request dict (subset of the
    reference grammar, utils.py:65-178: URL, -X, -H, -A, -e, -u, data
    flags, -I/-L, timeouts, retry)."""
    tokens = shlex.split(curl_string.strip())
    assert tokens and tokens[0] == "curl", "not a curl command"
    opts: dict = {"headers": {}}
    url = ""
    i = 1
    while i < len(tokens):
        tok = tokens[i]
        if tok in _CURL_HEADER_FLAGS:
            i += 1
            key, _, val = tokens[i].partition(":")
            opts["headers"][key.title()] = val.strip()
        elif tok in _CURL_VALUE_FLAGS:
            i += 1
            opts[_CURL_VALUE_FLAGS[tok]] = tokens[i]
        elif tok in _CURL_BOOL_FLAGS:
            opts[_CURL_BOOL_FLAGS[tok]] = True
        elif not tok.startswith("-") and not url:
            url = tok
        i += 1
    request: dict = {"url": opts.get("url") or url}
    headers = opts["headers"]
    if opts.get("user_agent"):
        headers["User-Agent"] = opts["user_agent"]
    if opts.get("referer"):
        headers["Referer"] = opts["referer"]
    if headers:
        request["headers"] = headers
    if opts.get("auth"):
        request["auth"] = (opts["auth"].split(":", 1) + [""])[:2]
    method = opts.get("method", "get")
    if opts.get("data") is not None:
        method = "post" if method.lower() == "get" else method
        request["data"] = opts["data"].encode(encoding)
    request["method"] = method.lower()
    if opts.get("head"):
        request["method"] = "head"
    ct, mt = opts.get("connect_timeout"), opts.get("max_time")
    if ct and mt:
        request["timeout"] = (float(ct), float(mt))
    elif ct:
        request["timeout"] = float(ct)
    elif mt:
        request["timeout"] = float(mt)
    if opts.get("location"):
        request["allow_redirects"] = True
    if opts.get("retry"):
        request["retry"] = int(opts["retry"])
    return request


def ensure_request(request) -> dict:
    """Normalize url-string / curl-string / JSON-string / dict into a
    request dict (reference utils.py:181-215)."""
    result: dict = {}
    if isinstance(request, dict):
        result = request
    elif isinstance(request, str):
        request = request.strip()
        if request.startswith("http"):
            result = {"method": "get", "url": request}
        elif request.startswith("curl "):
            result = curl_to_request(request)
        else:
            try:
                result = config.json_loads(request)
            except config.JSONDecodeError:
                pass
    if result:
        result["method"] = result.setdefault("method", "get").lower()
    return result


# ------------------------------------------------------ relative-path fix


def fix_relative_path(base_url: str, html: str, attrs=None, strict: bool = False) -> str:
    """Absolutize src/href/poster attributes against ``base_url``.

    Regex substitution (rather than a DOM round-trip) keeps every other
    byte of the document identical — required by the golden value at
    test_parsers.py:1386-1395.
    """
    attrs = attrs or ["src", "href", "poster"]
    alt = "|".join(re.escape(a) for a in attrs)
    if not strict and not re.search(rf"\s({alt})=['\"](?!https?://)", html):
        return html
    pattern = re.compile(rf"(\s(?:{alt})=)(['\"])(.*?)\2")

    def repl(m: re.Match) -> str:
        value = m.group(3)
        if value:
            value = urljoin(base_url, value)
        return f"{m.group(1)}{m.group(2)}{value}{m.group(2)}"

    return pattern.sub(repl, html)


# ---------------------------------------------------------- canonicalizer

_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def canonicalize_url(url: str) -> str:
    """Deterministic URL canonicalization for seen-set membership.

    Conservative on purpose: lowercase scheme+host, strip default port,
    drop a lone trailing '?'.  Query and fragment are preserved so that
    canonicalization is the identity on the reference corpus (exact
    string matching there; '#nonsense' tails are intentional, reference
    crawler.py:137).
    """
    if not url:
        return url
    scheme, sep, rest = url.partition("://")
    if not sep:
        return url.rstrip("?")
    hostport, slash, tail = rest.partition("/")
    host = hostport.lower()
    default = _DEFAULT_PORTS.get(scheme.lower())
    if default and host.endswith(default):
        host = host[: -len(default)]
    out = f"{scheme.lower()}://{host}{slash}{tail}"
    return out.rstrip("?") if out.endswith("?") else out
