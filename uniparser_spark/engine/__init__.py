from .extract import RESULT_SCHEMA, extract_pages
from .session import get_spark

__all__ = ["extract_pages", "RESULT_SCHEMA", "get_spark"]
