"""Unified URL-equivalence view (crawl/equivalence.py) tests."""

from uniparser_spark.crawl.equivalence import url_equivalence


def _run(spark, pages, log, rules=None):
    p = spark.createDataFrame(pages, "url string, canonical string")
    lg = spark.createDataFrame(log, "url string, status int, location string")
    r = (
        spark.createDataFrame(rules, "host string, param string")
        if rules is not None
        else None
    )
    return {
        row["url"]: (row["canonical_url"], row["source"], row["chained"])
        for row in url_equivalence(p, lg, r).collect()
    }


def test_precedence_and_sources(spark):
    pages = [
        ("https://a.ex/1", "https://a.ex/c"),  # redirect AND rel: redirect wins
        ("https://a.ex/2", "https://a.ex/c"),  # rel only
        ("https://a.ex/3?utm=9&k=2", None),  # dust only
        ("https://a.ex/4", None),  # self
        ("https://a.ex/5?utm=1", "https://a.ex/c"),  # rel beats dust
    ]
    log = [
        ("https://a.ex/1", 301, "https://a.ex/2"),
        ("https://a.ex/2", 200, None),
        ("https://a.ex/3?utm=9&k=2", 200, None),
        ("https://a.ex/4", 200, None),
        ("https://a.ex/5?utm=1", 200, None),
    ]
    out = _run(spark, pages, log, [("a.ex", "utm")])
    # /1 redirects to /2; /2 itself maps (rel) so the step is chained
    assert out["https://a.ex/1"] == ("https://a.ex/2", "redirect", True)
    assert out["https://a.ex/2"] == ("https://a.ex/c", "rel_canonical", False)
    assert out["https://a.ex/3?utm=9&k=2"] == (
        "https://a.ex/3?k=2", "dust", False,
    )
    assert out["https://a.ex/4"] == ("https://a.ex/4", "self", False)
    assert out["https://a.ex/5?utm=1"] == (
        "https://a.ex/c", "rel_canonical", False,
    )


def test_redirect_loop_excluded_dangling_kept(spark):
    pages = [("https://a.ex/l1", None), ("https://a.ex/l2", None),
             ("https://a.ex/d", None)]
    log = [
        ("https://a.ex/l1", 302, "https://a.ex/l2"),
        ("https://a.ex/l2", 302, "https://a.ex/l1"),  # 2-cycle: unresolved
        ("https://a.ex/d", 301, "https://a.ex/gone"),  # target unfetched
    ]
    out = _run(spark, pages, log)
    # a loop has no canonical name: both loop members fall through to self
    assert out["https://a.ex/l1"] == ("https://a.ex/l1", "self", False)
    assert out["https://a.ex/l2"] == ("https://a.ex/l2", "self", False)
    # dangling redirect target is still the canonical name
    assert out["https://a.ex/d"] == ("https://a.ex/gone", "redirect", False)


def test_multi_hop_redirect_resolves_to_final(spark):
    pages = [(f"https://a.ex/{i}", None) for i in (1, 2, 3)]
    log = [
        ("https://a.ex/1", 301, "https://a.ex/2"),
        ("https://a.ex/2", 301, "https://a.ex/3"),
        ("https://a.ex/3", 200, None),
    ]
    out = _run(spark, pages, log)
    # pointer doubling closes the 2-hop chain; /1 maps straight to /3,
    # and /3 is terminal so nothing is chained
    assert out["https://a.ex/1"] == ("https://a.ex/3", "redirect", False)
    assert out["https://a.ex/2"] == ("https://a.ex/3", "redirect", False)


def test_rel_self_canonical_is_identity(spark):
    pages = [("https://a.ex/p", "https://a.ex/p")]  # self-referential rel
    log = [("https://a.ex/p", 200, None)]
    out = _run(spark, pages, log)
    assert out["https://a.ex/p"] == ("https://a.ex/p", "self", False)
