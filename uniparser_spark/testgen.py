"""Deterministic synthetic Common-Crawl-style page corpus + rules.

Generates the input table shape mandated by BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``
— a PEP-demo-like site per host (one list page linking detail pages,
reference README.md:95-124) with Zipf-skewed host sizes so politeness /
skew handling is exercised.  Everything derives from (host index, page
index): no randomness, no external data.

Generation is Spark-native (``spark.range`` + ``mapInPandas``) so the
same code builds 40 rows for unit tests and 10^6+ rows for benchmarks
without a driver-side bottleneck.
"""

from __future__ import annotations

import bisect
from datetime import datetime, timezone
from typing import Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from . import config

BASE_EPOCH = 1580732985  # 2020-02-03 20:29:45 +08 (reference time fixture)

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
        StructField("html", BinaryType(), False),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), False),
    ]
)

_LANGS = ("en", "zh", "de")


def host_name(i: int) -> str:
    return f"host{i:04d}.example.org"


def list_url(host: str) -> str:
    return f"https://{host}/"


def detail_url(host: str, k: int) -> str:
    return f"https://{host}/item-{k:06d}/"


def zipf_counts(n_hosts: int, n_details: int, s: float = 1.2) -> List[int]:
    """Deterministic Zipf-ish split of n_details across hosts (host 0 is
    hot), every host getting at least one detail page."""
    weights = [1.0 / (i + 1) ** s for i in range(n_hosts)]
    total = sum(weights)
    counts = [max(1, int(n_details * w / total)) for w in weights]
    # fix rounding drift on the hot host
    counts[0] += n_details - sum(counts)
    if counts[0] < 1:
        counts[0] = 1
    return counts


def detail_html(host: str, k: int) -> str:
    return (
        "<html><head><title>Item {k} of {host}</title></head>\n"
        "<body>\n"
        '<h1 class="page-title">Item {k} – synthetic page on {host}</h1>\n'
        '<p class="meta"><span class="ts">{ts}</span></p>\n'
        "<p>Deterministic body text for item {k}. Lorem factum est verbum {k}.</p>\n"
        "</body></html>"
    ).format(k=k, host=host, ts=BASE_EPOCH + k)


def list_html(host: str, n_details: int) -> str:
    rows = "\n".join(
        f'<tr><td>{k}</td><td>meta</td><td><a class="pep" href="/item-{k:06d}/">Item {k}</a></td></tr>'
        for k in range(n_details)
    )
    return (
        f"<html><head><title>Index of {host}</title></head>\n"
        f"<body>\n<table>\n{rows}\n</table>\n</body></html>"
    )


def build_storage(n_hosts: int, keep_first: Optional[int] = None) -> dict:
    """JSONRuleStorage dict: per host a list rule (__request__ chain css →
    re-absolutize → optional getitem, exactly the reference PEP rule shape,
    test_parsers.py:1269) and a detail rule extracting the title."""
    storage = {}
    for i in range(n_hosts):
        host = host_name(i)
        chain = [
            ["css", "td:nth-of-type(3) > a.pep", "@href"],
            ["re", "^/?", f"@https://{host}/"],
        ]
        if keep_first is not None:
            chain.append(["python", "getitem", f"[:{keep_first}]"])
        storage[host] = {
            "host": host,
            "crawler_rules": {
                "list": {
                    "name": "list",
                    "request_args": {"method": "get", "url": list_url(host)},
                    "parse_rules": [
                        {"name": "__request__", "chain_rules": chain, "child_rules": []}
                    ],
                    "regex": f"^https://{host}/$",
                },
                "detail": {
                    "name": "detail",
                    "request_args": {"method": "get", "url": detail_url(host, 0)},
                    "parse_rules": [
                        {
                            "name": "title",
                            "chain_rules": [
                                ["css", "h1.page-title", "$text"],
                                ["python", "getitem", "[0]"],
                            ],
                            "child_rules": [],
                        }
                    ],
                    "regex": f"^https://{host}/item-\\d+/$",
                },
            },
        }
    return storage


def generate_pages(
    spark: SparkSession,
    n_hosts: int = 4,
    n_details: int = 36,
    zipf_s: float = 1.2,
    partitions: Optional[int] = None,
) -> DataFrame:
    """Pages DataFrame: one list page per host + Zipf-distributed detail
    pages.  Global page index = [list pages 0..n_hosts) then detail pages
    ordered by (host, k)."""
    counts = zipf_counts(n_hosts, n_details, zipf_s)
    offsets = [0]
    for c in counts:
        offsets.append(offsets[-1] + c)
    total = n_hosts + offsets[-1]
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            recs = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for j in batch["id"].tolist():
                if j < n_hosts:
                    host = host_name(j)
                    url = list_url(host)
                    html = list_html(host, counts[j])
                else:
                    d = j - n_hosts
                    hi = bisect.bisect_right(offsets, d) - 1
                    host = host_name(hi)
                    k = d - offsets[hi]
                    url = detail_url(host, k)
                    html = detail_html(host, k)
                recs["url"].append(url)
                recs["warc_ts"].append(
                    datetime.fromtimestamp(BASE_EPOCH + int(j), tz=timezone.utc)
                )
                recs["html"].append(html.encode("utf-8"))
                recs["text"].append(html)
                recs["lang"].append(_LANGS[int(j) % len(_LANGS)])
            yield pd.DataFrame(recs)

    return spark.range(0, total, 1, partitions).mapInPandas(gen, schema=PAGES_SCHEMA)


def storage_json(n_hosts: int, keep_first: Optional[int] = None) -> str:
    return config.json_dumps(build_storage(n_hosts, keep_first=keep_first))
