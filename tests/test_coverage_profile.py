"""sitemap_coverage and host_language_profile hand-computed cases."""

import math

from uniparser_spark.sources.sitemap import sitemap_coverage
from uniparser_spark.textops.mix import host_language_profile


def test_sitemap_coverage_both_gap_directions(spark):
    smap = spark.createDataFrame(
        [("https://a.ex/1",), ("https://a.ex/2",), ("https://a.ex/3",),
         ("https://b.ex/1",)],
        "url string",
    )
    crawl = spark.createDataFrame(
        [("https://a.ex/1",), ("https://a.ex/9",),  # 1 shared, 1 undeclared
         ("https://c.ex/1",)],  # crawl-only host: no sitemap at all
        "url string",
    )
    out = {r["host"]: r for r in sitemap_coverage(smap, crawl).collect()}
    a = out["a.ex"]
    assert (a["n_sitemap"], a["n_crawled"], a["n_both"]) == (3, 2, 1)
    assert (a["n_undiscovered"], a["n_undeclared"]) == (2, 1)
    assert a["coverage"] == 0.3333
    b = out["b.ex"]
    assert (b["n_sitemap"], b["n_crawled"], b["coverage"]) == (1, 0, 0.0)
    c = out["c.ex"]
    assert (c["n_sitemap"], c["n_crawled"]) == (0, 1)
    assert c["coverage"] is None  # no sitemap: ratio undefined, not 0


def test_sitemap_coverage_dedups_inputs(spark):
    smap = spark.createDataFrame(
        [("https://a.ex/1",), ("https://a.ex/1",)], "url string"
    )
    crawl = spark.createDataFrame([("https://a.ex/1",)], "url string")
    row = sitemap_coverage(smap, crawl).collect()[0]
    assert (row["n_sitemap"], row["n_both"], row["coverage"]) == (1, 1, 1.0)


def test_host_language_profile_majority_tie_and_entropy(spark):
    rows = (
        [("a.ex", "en")] * 2
        + [("a.ex", "de")] * 2  # tie with en: lang-asc pick = de
        + [("a.ex", "fr")]
        + [("b.ex", "zh")] * 3  # single-language host
    )
    df = spark.createDataFrame(rows, "host string, lang string")
    out = {r["host"]: r for r in host_language_profile(df).collect()}
    a = out["a.ex"]
    assert (a["n_docs"], a["n_langs"], a["majority_lang"]) == (5, 3, "de")
    assert a["majority_share"] == 0.4
    expect = -(0.4 * math.log(0.4) * 2 + 0.2 * math.log(0.2))
    assert a["lang_entropy"] == round(expect, 4)
    b = out["b.ex"]
    assert (b["n_langs"], b["majority_share"], b["lang_entropy"]) == (
        1, 1.0, 0.0,
    )
