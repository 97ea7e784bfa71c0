"""Falsy exception types (reference /root/reference/uniparser/exceptions.py).

These evaluate False so callers can treat returned errors as missing
results without isinstance checks.
"""


class FalsyError(Exception):
    __slots__ = ()

    def __bool__(self) -> bool:
        return False


class RuleNotFoundError(FalsyError):
    """No CrawlerRule matched the given URL."""


class UnknownParserNameError(FalsyError):
    """A chain rule referenced an unregistered operator name."""


class InvalidSchemaError(FalsyError):
    """A __schema__ chain did not return True."""
