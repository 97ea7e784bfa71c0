"""Unified discovery-feed merge: precedence, quotas, unknown sources."""


def test_merge_precedence_and_quota(spark):
    from uniparser_spark.crawl.discovery import merge_discovery_feeds

    feeds = spark.createDataFrame(
        [
            ("u1", "link", 50), ("u1", "sitemap", 90),  # sitemap wins
            ("u2", "cdx", 1), ("u2", "seed", 99),       # seed wins
            ("u3", "link", 10),
            ("u4", "link", 5),
            ("u5", "mystery", 1),                        # unknown ranks last
            ("u5", "cdx", 7),
        ],
        "url string, source string, priority int",
    )
    out = {
        r["url"]: r
        for r in merge_discovery_feeds(feeds, quotas={"link": 1}).collect()
    }
    assert len(out) == 5
    assert (out["u1"]["source"], out["u1"]["priority"]) == ("sitemap", 90)
    assert out["u2"]["source"] == "seed"
    assert out["u5"]["source"] == "cdx"  # known source beats unknown
    # link quota 1: u4 (priority 5) admitted, u3 (10) trimmed
    assert (out["u4"]["admitted"], out["u3"]["admitted"]) == (1, 0)
    # unquota'd sources always admitted
    assert all(out[u]["admitted"] == 1 for u in ("u1", "u2", "u5"))


def test_merge_no_quota_admits_all(spark):
    from uniparser_spark.crawl.discovery import merge_discovery_feeds

    feeds = spark.createDataFrame(
        [("a", "link", 1), ("b", "cdx", 2)], "url string, source string, priority int"
    )
    rows = merge_discovery_feeds(feeds).collect()
    assert sorted((r["url"], r["admitted"]) for r in rows) == [("a", 1), ("b", 1)]
