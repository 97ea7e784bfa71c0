"""Engine-wide configuration and sentinels.

Mirrors the observable contract of the reference GlobalConfig
(/root/reference/uniparser/config.py:4-64): magic result keys, the JSON
codec used for byte-stable rule serialization, and the error classes
that must never be swallowed into error-as-value results.
"""

import json

# Magic keys in parse results (reference config.py:12-19).
SCHEMA_KEY = "__schema__"     # chain must yield True, else InvalidSchemaError
REQUEST_KEY = "__request__"   # leaf value = URL(s) to crawl next
RESULT_KEY = "__result__"     # crawl attaches child results here
OBJECT_KEY = "__object__"     # rebinds the chain input for later parse_rules

ENCODING = "utf-8"

# Errors that must propagate instead of becoming data
# (reference config.py:7).
SYSTEM_ERRORS = (KeyboardInterrupt, OSError, SystemExit)

json_dumps = json.dumps
json_loads = json.loads
JSONDecodeError = json.JSONDecodeError


def new_context() -> dict:
    """Fresh per-parse shared context (reference config.py:61-64)."""
    return {}
