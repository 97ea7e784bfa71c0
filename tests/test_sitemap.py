"""Sitemap connector (sources/sitemap.py): parser round-trips, the
Spark entry table, robots Sitemap discovery, and the frontier seed
mapping."""

from datetime import datetime, timezone

import pytest

from uniparser_spark.sources.sitemap import (
    build_sitemap,
    build_sitemap_index,
    parse_sitemap,
    seeds_from_entries,
    sitemap_entries,
    sitemap_urls_from_robots,
)

TS = datetime(2026, 3, 4, 5, 6, 7, tzinfo=timezone.utc)


def test_parse_roundtrip_urlset():
    entries = [
        {"loc": "https://ex.org/a", "lastmod": TS, "changefreq": "daily", "priority": 0.8},
        {"loc": "https://ex.org/b&c"},  # escaping round-trips
    ]
    got = parse_sitemap(build_sitemap(entries))
    assert [e["loc"] for e in got] == ["https://ex.org/a", "https://ex.org/b&c"]
    assert got[0]["lastmod"] == TS and got[0]["priority"] == 0.8
    assert got[0]["changefreq"] == "daily" and got[0]["kind"] == "url"
    assert got[1]["lastmod"] is None and got[1]["priority"] is None


def test_parse_roundtrip_index_and_gzip():
    idx = build_sitemap_index(
        [("https://ex.org/sitemap-0.xml", TS), ("https://ex.org/sitemap-1.xml", None)],
        gz=True,
    )
    got = parse_sitemap(idx)
    assert all(e["kind"] == "sitemap" for e in got)
    assert [e["loc"] for e in got] == [
        "https://ex.org/sitemap-0.xml",
        "https://ex.org/sitemap-1.xml",
    ]
    assert got[0]["lastmod"] == TS


def test_parse_rejects_non_sitemap_and_malformed():
    with pytest.raises(ValueError, match="root element <html>"):
        parse_sitemap(b"<html><body/></html>")
    with pytest.raises(ValueError, match="malformed"):
        parse_sitemap(b"<urlset><url><loc>x</loc>")


def test_parse_skips_locless_and_bad_values():
    xml = b"""<?xml version="1.0"?>
    <urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <url><lastmod>2026-01-01</lastmod></url>
      <url><loc>https://ex.org/x</loc><priority>high</priority>
           <changefreq>SOMETIMES</changefreq><lastmod>not-a-date</lastmod></url>
    </urlset>"""
    got = parse_sitemap(xml)
    assert len(got) == 1
    e = got[0]
    assert e["loc"] == "https://ex.org/x"
    # invalid optional fields degrade to None, never raise
    assert e["priority"] is None and e["changefreq"] is None and e["lastmod"] is None


def test_parse_date_only_lastmod():
    got = parse_sitemap(
        build_sitemap([{"loc": "https://ex.org/a"}])[:-9]  # strip </urlset>
        + b"<url><loc>https://ex.org/d</loc><lastmod>2026-02-03</lastmod></url></urlset>"
    )
    assert got[-1]["lastmod"] == datetime(2026, 2, 3, tzinfo=timezone.utc)


def test_sitemap_entries_spark(spark):
    good = build_sitemap(
        [{"loc": "https://ex.org/p1", "lastmod": TS, "priority": 0.3},
         {"loc": "https://ex.org/p2", "changefreq": "weekly"}]
    )
    index = build_sitemap_index([("https://ex.org/sitemap-child.xml.gz", None)])
    bad = b"this is not xml"
    pages = spark.createDataFrame(
        [
            ("https://ex.org/sitemap.xml", bytearray(good)),
            ("https://ex.org/sitemap_index.xml", bytearray(index)),
            ("https://ex.org/sitemap-broken.xml", bytearray(bad)),
            ("https://ex.org/page.html", bytearray(b"<html/>")),  # pruned out
        ],
        "url string, html binary",
    )
    rows = {(r["kind"], r["loc"]) for r in sitemap_entries(pages).collect()}
    by_loc = {r["loc"]: r for r in sitemap_entries(pages).collect()}
    assert ("url", "https://ex.org/p1") in rows
    assert ("url", "https://ex.org/p2") in rows
    assert ("sitemap", "https://ex.org/sitemap-child.xml.gz") in rows
    assert any(k == "error" for k, _ in rows)
    assert by_loc["https://ex.org/p1"]["lastmod_epoch"] == int(TS.timestamp())
    assert by_loc["https://ex.org/p1"]["priority"] == 0.3
    assert by_loc["https://ex.org/p2"]["changefreq"] == "weekly"
    # the HTML page never reached Python
    assert all(loc != "<html/>" for _, loc in rows)


def test_robots_sitemap_discovery(spark):
    body = (
        "User-agent: *\nDisallow: /tmp\n"
        "Sitemap: https://a.org/sitemap.xml\n"
        "sitemap:https://a.org/sitemap-news.xml\n"
        "# Sitemap: https://a.org/commented.xml\n"
    )
    pages = spark.createDataFrame(
        [("https://a.org/robots.txt", body), ("https://a.org/x", "Sitemap: nope")],
        "url string, text string",
    )
    got = sitemap_urls_from_robots(pages).collect()
    assert [(r["host"], r["sitemap_idx"], r["sitemap_url"]) for r in got] == [
        ("a.org", 0, "https://a.org/sitemap.xml"),
        ("a.org", 1, "https://a.org/sitemap-news.xml"),
    ]


def test_seeds_from_entries(spark):
    entries = spark.createDataFrame(
        [
            ("s", "url", "https://ex.org/a", None, None, 0.9),
            ("s", "url", "https://ex.org/a", None, None, 0.2),  # dup keeps max
            ("s", "url", "https://ex.org/b", None, None, None),  # default 0.5
            ("s", "sitemap", "https://ex.org/child.xml", None, None, None),
            ("s", "error", "boom", None, None, None),
        ],
        "sitemap_url string, kind string, loc string, lastmod_epoch long, "
        "changefreq string, priority double",
    )
    got = {r["url"]: r["priority"] for r in seeds_from_entries(entries).collect()}
    assert got == {"https://ex.org/a": 0.9, "https://ex.org/b": 0.5}


def test_sitemap_refresh_regimes(spark):
    from uniparser_spark.sources.sitemap import sitemap_refresh

    entries = spark.createDataFrame(
        [
            ("s", "url", "https://e.org/new", None, None, 0.7),
            ("s", "url", "https://e.org/modified", 200, None, None),
            ("s", "url", "https://e.org/stale", 100, None, None),
            ("s", "url", "https://e.org/nolastmod", None, None, None),
            ("s", "sitemap", "https://e.org/child.xml", None, None, None),
        ],
        "sitemap_url string, kind string, loc string, lastmod_epoch long, "
        "changefreq string, priority double",
    )
    history = spark.createDataFrame(
        [("https://e.org/modified", 150), ("https://e.org/stale", 150),
         ("https://e.org/nolastmod", 150)],
        "url_canon string, last_fetch_epoch long",
    )
    got = {r["url"]: r for r in sitemap_refresh(entries, history).collect()}
    assert set(got) == {"https://e.org/new", "https://e.org/modified"}
    assert got["https://e.org/new"]["reason"] == "new"
    assert got["https://e.org/new"]["priority"] == 0.7
    assert got["https://e.org/modified"]["reason"] == "modified"
    # default priority for entries without one
    assert got["https://e.org/modified"]["priority"] == 0.5


def test_sitemap_roundtrip_fuzz():
    """Property fuzz: build_sitemap -> parse_sitemap is the identity on
    arbitrary loc/lastmod/changefreq/priority combinations (XML
    escaping, W3C date formatting, float formatting)."""
    from datetime import datetime, timedelta, timezone

    from hypothesis import given, settings, strategies as st

    locs = st.text(alphabet="ab/&<>\"'é?=1", min_size=1, max_size=20).map(
        lambda s: "https://f.org/" + s
    )
    lastmods = st.one_of(
        st.none(),
        st.integers(min_value=0, max_value=10**9).map(
            lambda s: datetime(2026, 1, 1, tzinfo=timezone.utc) + timedelta(seconds=s)
        ),
    )
    freqs = st.sampled_from([None, "daily", "weekly", "never"])
    prios = st.one_of(st.none(), st.integers(0, 10).map(lambda i: i / 10.0))

    @settings(max_examples=120, deadline=None)
    @given(st.lists(st.tuples(locs, lastmods, freqs, prios), min_size=0, max_size=4))
    def roundtrip(entries):
        built = build_sitemap(
            [
                {"loc": l, "lastmod": lm, "changefreq": cf, "priority": p}
                for l, lm, cf, p in entries
            ]
        )
        got = parse_sitemap(built)
        assert [e["loc"] for e in got] == [l for l, *_ in entries]
        for e, (l, lm, cf, p) in zip(got, entries):
            assert e["lastmod"] == lm
            assert e["changefreq"] == cf
            assert e["priority"] == p

    roundtrip()


def test_cross_submission_audit_verdicts(spark):
    from uniparser_spark.sources.sitemap import cross_submission_audit

    entries = spark.createDataFrame(
        [
            ("https://a.com/sm.xml", "https://a.com/p1"),       # same host
            ("https://a.com/sm.xml", "https://WWW.a.com/p2"),   # www differs!
            ("https://a.com/sm.xml", "https://b.com/p3"),       # validated
            ("https://a.com/sm.xml", "https://c.com/p4"),       # not validated
        ],
        "sitemap_url string, loc string",
    )
    robots = spark.createDataFrame(
        [("b.com", "https://a.com/sm.xml")], "host string, sitemap_url string"
    )
    got = {r["loc"]: r["verdict"] for r in cross_submission_audit(entries, robots).collect()}
    assert got["https://a.com/p1"] == "same_host"
    # protocol rule: www.a.com is a DIFFERENT host, and undeclared
    assert got["https://WWW.a.com/p2"] == "cross_unvalidated"
    assert got["https://b.com/p3"] == "cross_validated"
    assert got["https://c.com/p4"] == "cross_unvalidated"
