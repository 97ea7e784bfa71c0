from .engine import CrawlEngine
from .equivalence import url_equivalence
from .redirects import resolve_redirects, soft404_scores
from .simulator import simulate_crawl

__all__ = [
    "CrawlEngine",
    "resolve_redirects",
    "simulate_crawl",
    "soft404_scores",
    "url_equivalence",
]
