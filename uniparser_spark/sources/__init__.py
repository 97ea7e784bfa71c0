"""Input connectors that land external formats on the engine's
canonical Common-Crawl pages schema (url, warc_ts, html, text, lang)."""

from .feed import (  # noqa: F401
    build_atom,
    build_rss,
    feed_entries,
    parse_feed,
    seeds_from_feed,
)
from .sitemap import (  # noqa: F401
    build_sitemap,
    build_sitemap_index,
    parse_sitemap,
    seeds_from_entries,
    sitemap_entries,
    sitemap_urls_from_robots,
)
from .warc import build_warc, iter_warc_records, read_warc  # noqa: F401
