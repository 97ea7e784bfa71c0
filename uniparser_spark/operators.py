"""The extraction operator library.

Each operator is a function ``fn(input_object, param, value) -> Any``
registered under the reference's parser names + aliases
(/root/reference/uniparser/parsers.py:1264-1284).  ``apply_operator``
adds the two cross-cutting behaviors every operator shares
(parsers.py:93-105):

- list recursion: string-oriented operators map themselves over list
  inputs (``RECURSIVE_OPS``);
- error-as-value: any non-system exception is *returned*, never raised,
  so one bad record can't kill a Spark task.

All functions are pure Python and run inside Arrow-batched pandas UDFs
on executors; compiled selector/regex/program objects are cached
per-process via ``lru_cache`` (the reference pre-compiles at rule load,
parsers.py:980-1003 — a process-global memo gives the same effect
without mutating rule trees).
"""

from __future__ import annotations

import base64
import binascii
import hashlib
import json
import re
import time as _time
from functools import lru_cache
from itertools import chain as _chain
from string import Template
from typing import Any, Callable, Dict, Optional

from . import config
from .dom import parse_html, parse_xml
from .dom.nodes import Element
from .dom.xpath import xpath_select
from .exceptions import UnknownParserNameError
from .paths import jsonpath_values, objectpath_execute

try:
    import jmespath as _jmespath
except ImportError:  # pragma: no cover
    _jmespath = None

try:
    import yaml as _yaml
except ImportError:  # pragma: no cover
    _yaml = None

import tomllib as _tomllib

# --------------------------------------------------------------------- utils


def md5(obj: Any, n: int = 32, encoding: str = "utf-8", skip_encode: bool = False) -> Optional[str]:
    """str(obj) -> md5 hex digest, center-sliced to length n
    (reference parsers.py:39-56)."""
    data = obj if skip_encode else str(obj).encode(encoding)
    digest = hashlib.md5(data).hexdigest()
    if n == 32:
        return digest
    if isinstance(n, (int, float)):
        return digest[(32 - int(n)) // 2 : (int(n) - 32) // 2]
    if isinstance(n, (tuple, list)):
        return digest[n[0] : n[1]]
    return None


def encode_as_base64(s: str, encoding: str = "utf-8") -> str:
    return base64.b64encode(s.encode(encoding)).decode(encoding)


def decode_as_base64(s: str, encoding: str = "utf-8") -> str:
    return base64.b64decode(s.encode(encoding)).decode(encoding)


def _ensure_json(obj: Any) -> Any:
    return config.json_loads(obj) if isinstance(obj, str) else obj


def _strip_json_prefix(path: str) -> str:
    # 'JSON.foo' is shorthand for '$.foo' (parsers.py:502-503)
    return "$" + path[4:] if path.startswith("JSON.") else path


# ----------------------------------------------------------- HTML selection

_HTML_VALUE_OPS: Dict[str, Callable[[Element], Any]] = {
    "$text": lambda el: el.text,
    "$innerHTML": lambda el: el.inner(),
    "$html": lambda el: el.inner(),
    "$outerHTML": lambda el: str(el),
    "$string": lambda el: str(el),
    "$self": lambda el: el,
}

# selectolax flavor: $html/$innerHTML are the inner serialization,
# $string/$outerHTML the outer one (parsers.py:272-280); same shapes here.
_SE_VALUE_OPS = _HTML_VALUE_OPS


def _as_html_dom(obj: Any) -> Element:
    return obj if isinstance(obj, Element) else parse_html(obj)


def op_css(obj: Any, param: str, value: str) -> Any:
    if not obj:
        return []
    dom = _as_html_dom(obj)
    if value.startswith("@"):
        return [el.get(value[1:]) for el in dom.select(param)]
    fn = _HTML_VALUE_OPS.get(value, lambda el: el)
    return [fn(el) for el in dom.select(param)]


def op_css1(obj: Any, param: str, value: str) -> Any:
    if not obj:
        return []
    el = _as_html_dom(obj).select_one(param)
    if el is None:
        return None
    if value.startswith("@"):
        return el.get(value[1:])
    return _HTML_VALUE_OPS.get(value, lambda e: e)(el)


def op_selectolax(obj: Any, param: str, value: str) -> Any:
    if not obj:
        return []
    dom = _as_html_dom(obj)
    if value.startswith("@"):
        return [el.attributes.get(value[1:]) for el in dom.select(param)]
    fn = _SE_VALUE_OPS.get(value, lambda el: el)
    return [fn(el) for el in dom.select(param)]


def op_selectolax1(obj: Any, param: str, value: str) -> Any:
    if not obj:
        return []
    el = _as_html_dom(obj).select_one(param)
    if el is None:
        return ""  # selectolax single-match miss is '' (parsers.py:327-328)
    if value.startswith("@"):
        return el.attributes.get(value[1:])
    return _SE_VALUE_OPS.get(value, lambda e: e)(el)


_XML_VALUE_OPS: Dict[str, Callable[[Element], Any]] = {
    "$text": lambda el: el.text,
    "$innerXML": lambda el: el.inner(),
    "$outerXML": lambda el: str(el),
    "$self": lambda el: el,
}


def op_xml(obj: Any, param: str, value: str) -> Any:
    if not obj:
        return []
    dom = obj if isinstance(obj, Element) else parse_xml(obj)
    if value.startswith("@"):
        return [el.get(value[1:]) for el in dom.select(param)]
    fn = _XML_VALUE_OPS.get(value, lambda el: el)
    return [fn(el) for el in dom.select(param)]


def op_xpath(obj: Any, param: str, value: str) -> Any:
    """XPath-subset extraction (beyond the reference, whose xml parser
    is CSS-based — parsers.py:336 "not support `xpath` for now"; the
    north-star rule language names XPath chains explicitly).

    ``param`` is the XPath; string results (``@attr`` / ``text()``
    paths) pass through, element results take the css-style ``value``
    ops ($text / $outerHTML / @attr), defaulting to the element itself.
    """
    if not obj:
        return []
    if isinstance(obj, Element):
        dom = obj
    else:
        s = obj if isinstance(obj, str) else str(obj)
        dom = parse_xml(s) if s.lstrip()[:5] == "<?xml" else parse_html(s)
    out = xpath_select(dom, param)
    if value.startswith("@"):
        fn = lambda el: el.get(value[1:])  # noqa: E731
    else:
        fn = _HTML_VALUE_OPS.get(value, lambda el: el)
    return [fn(n) if isinstance(n, Element) else n for n in out]


# ----------------------------------------------------------------- regex

_RE_VALUE_OK = re.compile(r"^@|^\$\d+|^-$|^#\d+")


@lru_cache(maxsize=4096)
def _re_compile(pattern: str):
    return re.compile(pattern)


def op_re(obj: Any, param: str, value: str) -> Any:
    if not isinstance(obj, str):
        raise ValueError(f"input_object type should be str, but given {repr(obj)[:30]}")
    if value and not _RE_VALUE_OK.match(value):
        raise ValueError(r"args1 should match ^@|^\$\d+|^-$|^#\d+")
    pattern = _re_compile(param)
    if not value:
        return pattern.findall(obj)
    head, rest = value[0], value[1:]
    if head == "@":
        return pattern.sub(rest, obj)
    if head == "$":
        return [m.group(int(rest)) for m in pattern.finditer(obj)]
    if head == "-":
        return pattern.split(obj)
    # '#N' -> search().group(N), '' when unmatched (parsers.py:460-471)
    m = pattern.search(obj)
    if not m:
        return ""
    try:
        return m.group(int(rest) if rest.isdigit() else 1)
    except IndexError:
        return ""


# ------------------------------------------------------------- path queries


def op_jsonpath(obj: Any, param: str, value: str = "") -> Any:
    data = _ensure_json(obj)
    attr = (value or "$value")[1:]
    return jsonpath_values(data, _strip_json_prefix(param), attr)


def op_objectpath(obj: Any, param: str, value: str = "") -> Any:
    data = _ensure_json(obj)
    return objectpath_execute(data, _strip_json_prefix(param))


@lru_cache(maxsize=4096)
def _jmespath_compile(expr: str):
    return _jmespath.compile(expr)


def op_jmespath(obj: Any, param: str, value: str = "") -> Any:
    data = _ensure_json(obj)
    if param.startswith("JSON."):
        param = param[5:]
    return _jmespath_compile(param).search(data)


# ------------------------------------------------------------------- python


def _py_getitem(obj: Any, value: str) -> Any:
    if value and value[0] == "[" and value[-1] == "]":
        inner = value[1:-1]
        if ":" in inner:
            parts = inner.split(":")
            nums = [int(p) if p else None for p in parts[:3]]
            nums += [None] * (3 - len(nums))
            return obj[slice(*nums)]
        return obj[int(inner)]
    return obj[value]


def _py_index(obj: Any, value: str) -> Any:
    is_int = value.isdigit() or (value.startswith("-") and value[1:].isdigit())
    return obj[int(value) if is_int else value]


def _py_template(obj: Any, value: str) -> str:
    if isinstance(obj, dict):
        return Template(value).safe_substitute(input_object=obj, obj=obj, **obj)
    return Template(value).safe_substitute(input_object=obj, obj=obj)


def _py_default(obj: Any, value: str) -> Any:
    if isinstance(obj, str):
        return obj if obj.strip() else value
    return obj if obj else value


_PY_OPS: Dict[str, Callable[[Any, str], Any]] = {
    "getitem": _py_getitem,
    "get": _py_getitem,
    "split": lambda obj, value: obj.split(value or None),
    "join": lambda obj, value: value.join(obj),
    "chain": lambda obj, value: list(_chain(*obj)),
    "const": lambda obj, value: value or obj,
    "template": _py_template,
    "index": _py_index,
    "sort": lambda obj, value: sorted(obj, reverse=value.lower() == "desc"),
    "strip": lambda obj, value: str(obj).strip(value or None),
    "default": _py_default,
    "base64_encode": lambda obj, value: encode_as_base64(str(obj)),
    "base64_decode": lambda obj, value: decode_as_base64(str(obj)),
}


def op_python(obj: Any, param: str, value: str) -> Any:
    fn = _PY_OPS.get(param)
    if fn is not None:
        return fn(obj, value)
    if param.isdigit():
        # numeric param: positional index with `value` as the default
        # (parsers.py:765-779)
        try:
            return obj[int(param)]
        except (IndexError, ValueError, KeyError, TypeError):
            return value
    return value or obj


# --------------------------------------------------------------------- udf

ALLOW_IMPORT = True

_FORBIDDEN = {
    "input": NotImplemented,
    "open": NotImplemented,
    "eval": NotImplemented,
    "exec": NotImplemented,
}

_UDF_HELPERS = {
    "md5": md5,
    "json_loads": config.json_loads,
    "json_dumps": config.json_dumps,
    "re": re,
    "encode_as_base64": encode_as_base64,
    "decode_as_base64": decode_as_base64,
}


def udf_code_mode(source: str) -> str:
    """'exec' when the snippet defines a `parse` function, else 'eval'
    (reference parsers.py:621-628)."""
    if "parse" in source and ("lambda" in source or "def " in source):
        return "exec"
    return "eval"


@lru_cache(maxsize=2048)
def _udf_compile(source: str):
    mode = udf_code_mode(source)
    return mode, compile(source, source, mode)


def op_udf(obj: Any, param: str, value: Any = "") -> Any:
    if value and isinstance(value, str):
        try:
            context = config.json_loads(value)
        except config.JSONDecodeError:
            context = {}
    else:
        context = value or {}
    if not ALLOW_IMPORT and "import" in param:
        raise RuntimeError(
            "udf imports are disabled; set uniparser_spark.operators.ALLOW_IMPORT = True to permit them"
        )
    scope: Dict[str, Any] = {"input_object": obj, "obj": obj, "context": context}
    scope.update(_FORBIDDEN)
    scope.update(_UDF_HELPERS)
    extra_locals = context.get("locals") if isinstance(context, dict) else None
    if extra_locals:
        scope.update(extra_locals)
    mode, code = _udf_compile(param)
    if mode == "exec":
        exec(code, scope, scope)  # noqa: S102 - sandboxed rule-authored code
        parse_fn = scope.get("parse")
        if not parse_fn:
            raise ValueError("UDF snippet should have a function named `parse`")
        return parse_fn(obj)
    return eval(code, scope, scope)  # noqa: S307


# ------------------------------------------------------------------- loader


def _b_codec(codec: str, decode: bool) -> Callable[[str], str]:
    enc_fn = getattr(base64, f"{codec}decode" if decode else f"{codec}encode")

    def convert(s: str) -> str:
        return enc_fn(s.encode(config.ENCODING)).decode(config.ENCODING)

    return convert


def _toml_loads(s: str, **kwargs: Any) -> Any:
    # tomllib takes no decoder kwarg; the reference forwards `{"decoder":
    # null}` style kwargs to toml.loads — accept and drop them.
    kwargs.pop("decoder", None)
    return _tomllib.loads(s, **kwargs)


_LOADERS: Dict[str, Callable[..., Any]] = {
    "json": config.json_loads,
    "toml": _toml_loads,
    "b16decode": _b_codec("b16", True),
    "b16encode": _b_codec("b16", False),
    "b32decode": _b_codec("b32", True),
    "b32encode": _b_codec("b32", False),
    "b64decode": _b_codec("b64", True),
    "b64encode": _b_codec("b64", False),
    "b85decode": _b_codec("b85", True),
    "b85encode": _b_codec("b85", False),
}
if _yaml is not None:
    _LOADERS["yaml"] = _yaml.full_load
    _LOADERS["yaml_full_load"] = _yaml.full_load
    _LOADERS["yaml_safe_load"] = _yaml.safe_load


def op_loader(obj: Any, param: str, value: str = "") -> Any:
    loader = _LOADERS.get(param, lambda s, **kw: s)
    if value:
        try:
            kwargs = config.json_loads(value)
        except config.JSONDecodeError as err:
            return err
        return loader(obj, **kwargs)
    return loader(obj)


# --------------------------------------------------------------------- time

# EAST8 = +8, WEST8 = -8 (reference parsers.py:929-932). OS_TZ is derived
# from the running process; LOCAL_TIME_ZONE is engine state, pinned to UTC
# by the Spark session setup for determinism.
OS_TIME_ZONE: int = -int(_time.timezone / 3600)
LOCAL_TIME_ZONE: int = OS_TIME_ZONE

_NUMERIC = re.compile(r"^-?\d+(\.\d+)?$")


def op_time(obj: Any, param: str, value: str) -> Any:
    fmt = value or "%Y-%m-%d %H:%M:%S"
    fix_seconds = (LOCAL_TIME_ZONE - OS_TIME_ZONE) * 3600
    if param == "encode":
        return _time.mktime(_time.strptime(obj, fmt)) - fix_seconds
    if param == "decode":
        if isinstance(obj, str) and _NUMERIC.match(obj):
            obj = float(obj)
        return _time.strftime(fmt, _time.localtime(obj + fix_seconds))
    return obj


# ------------------------------------------------------------------ context


def op_context(obj: Any, param: str, value: Any) -> Any:
    if not obj or param not in obj:
        return value
    return obj[param]


# ----------------------------------------------------------------- registry

# operators that map themselves over list inputs (reference
# _RECURSION_LIST=True: parsers.py:86,495,532,567,606,736)
RECURSIVE_OPS = frozenset(
    {"css", "css1", "selectolax", "se", "se1", "selectolax1", "xml", "xpath", "re", "loader", "time", "context"}
)

_CANONICAL: Dict[str, Callable[[Any, str, Any], Any]] = {
    "css": op_css,
    "css1": op_css1,
    "selectolax": op_selectolax,
    "selectolax1": op_selectolax1,
    "xml": op_xml,
    "xpath": op_xpath,
    "re": op_re,
    "jsonpath": op_jsonpath,
    "objectpath": op_objectpath,
    "jmespath": op_jmespath,
    "python": op_python,
    "udf": op_udf,
    "loader": op_loader,
    "time": op_time,
    "context": op_context,
}

_ALIASES = {
    "se": "selectolax",
    "se1": "selectolax1",
    "py": "python",
    "json": "jmespath",
}

OPERATORS: Dict[str, Callable[[Any, str, Any], Any]] = dict(_CANONICAL)
OPERATORS.update({alias: _CANONICAL[target] for alias, target in _ALIASES.items()})


def resolve(name: str) -> Callable[[Any, str, Any], Any]:
    fn = OPERATORS.get(name)
    if fn is None:
        raise UnknownParserNameError(f"Unknown parser name: {name}")
    return fn


def apply_operator(name: str, obj: Any, param: str, value: Any) -> Any:
    """Run one operator with list-recursion + error-as-value semantics."""
    fn = resolve(name)
    recursive = name in RECURSIVE_OPS or _ALIASES.get(name) in RECURSIVE_OPS
    try:
        if recursive and isinstance(obj, list):
            return [fn(item, param, value) for item in obj]
        return fn(obj, param, value)
    except config.SYSTEM_ERRORS:
        raise
    except Exception as err:  # noqa: BLE001 - errors are data (parsers.py:101-105)
        return err
