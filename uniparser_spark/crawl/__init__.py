from .engine import CrawlEngine
from .simulator import simulate_crawl

__all__ = ["CrawlEngine", "simulate_crawl"]
