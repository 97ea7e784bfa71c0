"""WARC revisit records: writer, index reader, digest resolution."""

from datetime import datetime, timezone

from uniparser_spark.sources.warc import (
    build_warc,
    build_warc_revisits,
    records_index,
    revisit_resolution,
)

TS0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
TS1 = datetime(2026, 1, 2, tzinfo=timezone.utc)
TS2 = datetime(2026, 1, 3, tzinfo=timezone.utc)


def _index(data):
    return list(records_index(data))


def test_index_keeps_revisits_and_computes_response_digests():
    import hashlib

    data = build_warc([("https://a.ex/1", TS0, b"hello")]) + build_warc_revisits(
        [
            ("https://a.ex/1b", TS1, "sha1:ABCDEF"),
            ("https://a.ex/1c", TS2, None),  # no digest header
        ]
    )
    rows = _index(data)
    assert [r["warc_type"] for r in rows] == ["response", "revisit", "revisit"]
    assert rows[0]["digest"] == "md5:" + hashlib.md5(b"hello").hexdigest()
    # header digest passes through verbatim (real CC sha1:B32 shape)
    assert rows[1]["digest"] == "sha1:ABCDEF"
    assert rows[2]["digest"] is None
    assert rows[0]["warc_ts"].year == 2026


def test_resolution_verdicts(spark):
    rows = [
        # two responses sharing a digest: earlier epoch is the original
        ("https://a.ex/1", 100, "response", "md5:aaa"),
        ("https://a.ex/0-later-name-sorts-first", 200, "response", "md5:aaa"),
        ("https://a.ex/2", 150, "response", "md5:bbb"),
        ("https://a.ex/r1", 300, "revisit", "md5:aaa"),
        ("https://a.ex/r2", 300, "revisit", "md5:zzz"),  # orphan digest
        ("https://a.ex/r3", 300, "revisit", None),  # missing digest
    ]
    df = spark.createDataFrame(
        rows, "url string, epoch long, warc_type string, digest string"
    )
    out = {r["url"]: r for r in revisit_resolution(df).collect()}
    assert out["https://a.ex/1"]["verdict"] == "original"
    # later capture of the same payload, despite the smaller url string
    assert out["https://a.ex/0-later-name-sorts-first"]["verdict"] == "duplicate"
    assert (
        out["https://a.ex/0-later-name-sorts-first"]["original_url"]
        == "https://a.ex/1"
    )
    assert out["https://a.ex/2"]["verdict"] == "original"
    assert out["https://a.ex/r1"]["verdict"] == "revisit_resolved"
    assert out["https://a.ex/r1"]["original_url"] == "https://a.ex/1"
    assert out["https://a.ex/r2"]["verdict"] == "revisit_orphan"
    assert out["https://a.ex/r2"]["original_url"] is None
    assert out["https://a.ex/r3"]["verdict"] == "revisit_orphan"


def test_epoch_tie_breaks_on_min_url(spark):
    rows = [
        ("https://a.ex/b", 100, "response", "md5:t"),
        ("https://a.ex/a", 100, "response", "md5:t"),
    ]
    df = spark.createDataFrame(
        rows, "url string, epoch long, warc_type string, digest string"
    )
    out = {r["url"]: r["verdict"] for r in revisit_resolution(df).collect()}
    assert out["https://a.ex/a"] == "original"
    assert out["https://a.ex/b"] == "duplicate"
