"""WARC connector tests: stdlib parser round-trip, malformed-stream
errors, and the binaryFile → mapInPandas Spark path on real files."""

from datetime import datetime, timezone

import pytest

from uniparser_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    records_to_pages,
    read_warc,
    split_http_payload,
)

TS = datetime(2026, 1, 2, 3, 4, 5, tzinfo=timezone.utc)


def _recs(n, host="w.example.org"):
    return [
        (
            f"https://{host}/p/{i}",
            TS,
            f"<html><body><h1>Page {i}</h1></body></html>".encode(),
        )
        for i in range(n)
    ]


@pytest.mark.parametrize("gz", [True, False])
def test_roundtrip_plain_and_gzip(gz):
    data = build_warc(_recs(5), gzip_per_record=gz, content_language="en")
    pages = list(records_to_pages(data))
    assert [p["url"] for p in pages] == [f"https://w.example.org/p/{i}" for i in range(5)]
    assert all(p["warc_ts"] == TS for p in pages)
    assert pages[3]["html"] == b"<html><body><h1>Page 3</h1></body></html>"
    assert pages[3]["text"] == "<html><body><h1>Page 3</h1></body></html>"
    assert all(p["lang"] == "en" for p in pages)


def test_gzip_build_is_deterministic():
    assert build_warc(_recs(3)) == build_warc(_recs(3))


def test_non_response_records_are_skipped_and_http_split():
    # hand-build a warcinfo record followed by one response
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 9\r\n\r\n"
        b"robots: x\r\n\r\n"
    )
    data = info + build_warc(_recs(1), gzip_per_record=False)
    assert len(list(iter_warc_records(data))) == 2
    pages = list(records_to_pages(data))
    assert len(pages) == 1 and pages[0]["url"].endswith("/p/0")
    # http split keeps exact body bytes
    headers, body = split_http_payload(
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=latin-1\r\n\r\n\xe9tude"
    )
    assert headers["content-type"].startswith("text/html")
    assert body == b"\xe9tude"


def test_charset_and_missing_http_prelude():
    headers, body = split_http_payload(b"raw bytes, no http")
    assert headers == {} and body == b"raw bytes, no http"
    data = build_warc(_recs(1), content_type="text/html; charset=latin-1")
    page = next(records_to_pages(data))
    assert page["text"].startswith("<html>")


def test_malformed_streams_raise_named_errors():
    with pytest.raises(ValueError, match="expected record header"):
        list(iter_warc_records(b"NOT A WARC"))
    ok = build_warc(_recs(1), gzip_per_record=False)
    with pytest.raises(ValueError, match="truncated"):
        list(iter_warc_records(ok[:-20]))
    no_len = b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(no_len))


def test_read_warc_binaryfile_path(spark, tmp_path):
    # two segments, gzip member per record — the Common-Crawl layout
    (tmp_path / "seg-00000.warc.gz").write_bytes(
        build_warc(_recs(7), content_language="en")
    )
    (tmp_path / "seg-00001.warc.gz").write_bytes(
        build_warc(_recs(4, host="x.example.org"))
    )
    (tmp_path / "ignore.txt").write_text("not a segment")
    df = read_warc(spark, str(tmp_path))
    rows = sorted(df.collect(), key=lambda r: r.url)
    assert len(rows) == 11
    assert {r.url.split("/")[2] for r in rows} == {"w.example.org", "x.example.org"}
    r0 = [r for r in rows if r.url == "https://w.example.org/p/0"][0]
    assert bytes(r0.html) == b"<html><body><h1>Page 0</h1></body></html>"
    assert r0.text == "<html><body><h1>Page 0</h1></body></html>"
    assert r0.lang == "en" and r0.warc_ts.year == 2026
    # the decoded table feeds the extraction engine unchanged
    from uniparser_spark.dom import parse_html

    assert parse_html(r0.text).select_one("h1").text == "Page 0"


def test_wet_conversion_records_roundtrip():
    """WET (extracted-text) segments: conversion records parse onto the
    canonical pages schema with the plain-text payload as text."""
    from datetime import datetime, timezone

    from uniparser_spark.sources.warc import build_wet, records_to_pages

    ts = datetime(2026, 5, 6, 7, 8, 9, tzinfo=timezone.utc)
    wet = build_wet(
        [("https://a.org/p1", ts, "extracted text one"),
         ("https://a.org/p2", ts, "unicode ünïcodé")]
    )
    pages = list(records_to_pages(wet))
    assert [p["url"] for p in pages] == ["https://a.org/p1", "https://a.org/p2"]
    assert pages[0]["text"] == "extracted text one"
    assert pages[1]["text"] == "unicode ünïcodé"
    assert pages[0]["warc_ts"] == ts
    assert pages[0]["html"] == b"extracted text one"  # raw payload bytes
    assert pages[0]["lang"] is None  # no HTTP envelope -> no header


def test_write_warc_segments_and_roundtrip(spark, tmp_path):
    """Distributed sink: one committed segment per non-empty partition,
    manifest counts match, read_warc returns the original rows."""
    from datetime import datetime, timezone

    from pyspark.sql import functions as F

    from uniparser_spark.sources.warc import read_warc, write_warc

    rows = [
        (f"https://s.org/{i}", datetime(2026, 1, 1, 0, 0, i, tzinfo=timezone.utc),
         f"body {i}".encode(), ["en", "de"][i % 2])
        for i in range(10)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, lang string"
    ).repartition(3)
    out = str(tmp_path / "warc_out")
    manifest = write_warc(pages, out).collect()
    assert sum(m["n_records"] for m in manifest) == 10
    segs = [m["segment"] for m in manifest]
    assert all(s.endswith(".warc.gz") for s in segs)
    import os
    assert sorted(os.listdir(out)) == sorted(segs)  # no .tmp leftovers

    back = read_warc(spark, out)
    got = {
        r["url"]: (r["text"], r["lang"], r["warc_ts"].second)
        for r in back.collect()
    }
    assert got == {u: (f"body {i}", ["en", "de"][i % 2], i)
                   for i, (u, *_rest) in enumerate(rows)}


def test_write_warc_string_body_and_null_lang(spark, tmp_path):
    from datetime import datetime, timezone

    from uniparser_spark.sources.warc import read_warc, write_warc

    pages = spark.createDataFrame(
        [("https://s.org/x", datetime(2026, 1, 1, tzinfo=timezone.utc), "txt")],
        "url string, warc_ts timestamp, html string",
    )
    out = str(tmp_path / "warc_out2")
    write_warc(pages, out, lang_col=None).count()
    row = read_warc(spark, out).collect()[0]
    assert (row["text"], row["lang"]) == ("txt", None)
