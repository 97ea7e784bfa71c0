"""Input connectors that land external formats on the engine's
canonical Common-Crawl pages schema (url, warc_ts, html, text, lang)."""

from .warc import build_warc, iter_warc_records, read_warc  # noqa: F401
