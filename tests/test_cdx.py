"""CDX(J) index connector (sources/cdx.py)."""

from pyspark.sql import functions as F

from uniparser_spark.sources.cdx import cdx_seed_candidates, parse_cdx_lines


def _lines(spark, rows):
    return spark.createDataFrame([(r,) for r in rows], "value string")


def test_parse_cdx_lines_typed(spark):
    rows = [
        'org,example)/a 20260102030405 {"url": "https://example.org/a", '
        '"status": "200", "mime": "text/html", "digest": "D1", '
        '"length": "1234", "offset": "567", "filename": "seg-0.warc.gz"}',
        'org,example)/b 20260102030406 {"url": "https://example.org/b", '
        '"status": "404", "mime": "text/html", "digest": "D2"}',
        "garbage line without json",
    ]
    got = {r["urlkey"]: r for r in parse_cdx_lines(_lines(spark, rows)).collect()}
    a = got["org,example)/a"]
    assert a["url"] == "https://example.org/a" and a["status"] == 200
    assert a["length"] == 1234 and a["offset"] == 567
    assert a["filename"] == "seg-0.warc.gz" and a["valid"] == 1
    assert str(a["ts"]).startswith("2026-01-02 03:04:05")
    assert got["org,example)/b"]["status"] == 404
    assert got["garbage"]["valid"] == 0  # error-as-data, not dropped


def test_cdx_seed_candidates_triage(spark):
    rows = [
        # two captures of the same url: later one has digest DN
        'k1 20260101000000 {"url": "https://a.org/x", "status": "200", "mime": "text/html", "digest": "OLD"}',
        'k1 20260201000000 {"url": "https://a.org/x", "status": "200", "mime": "text/html", "digest": "DN"}',
        # mirror: different url, same latest digest -> collapses to MIN url
        'k2 20260201000000 {"url": "https://a.org/mirror-of-x", "status": "200", "mime": "text/html", "digest": "DN"}',
        # non-200 and non-html are triaged out
        'k3 20260201000000 {"url": "https://a.org/404", "status": "404", "mime": "text/html", "digest": "D4"}',
        'k4 20260201000000 {"url": "https://a.org/img", "status": "200", "mime": "image/png", "digest": "D5"}',
        # distinct content -> kept
        'k5 20260201000000 {"url": "https://a.org/y", "status": "200", "mime": "text/html; charset=utf-8", "digest": "D6"}',
    ]
    caps = parse_cdx_lines(_lines(spark, rows))
    got = {r["url"]: r["priority"] for r in cdx_seed_candidates(caps).collect()}
    # mirror collapse: min("https://a.org/mirror-of-x", "https://a.org/x")
    assert got == {"https://a.org/mirror-of-x": 0.0, "https://a.org/y": 0.0}
