"""WAT connector tests: JSON envelope round-trip, escaping, corrupt
payload error-as-data, and the binaryFile → mapInPandas Spark path."""

from datetime import datetime, timezone

from uniparser_spark.sources.warc import build_warc
from uniparser_spark.sources.wat import build_wat, read_wat, records_to_meta

TS = datetime(2026, 3, 4, 5, 6, 7, tzinfo=timezone.utc)


def _entries(n):
    return [
        {
            "url": f"https://wat.example.org/p/{i}",
            "ts": TS,
            "title": f'Doc "{i}" — <étude> & co',
            "links": [
                (f"https://wat.example.org/p/{i + k + 1}", f"next {k}")
                for k in range(i % 3)
            ],
        }
        for i in range(n)
    ]


def test_roundtrip_titles_links_and_escaping():
    metas = list(records_to_meta(build_wat(_entries(5))))
    assert [m["url"] for m in metas] == [
        f"https://wat.example.org/p/{i}" for i in range(5)
    ]
    # JSON escaping survives quotes, unicode, angle brackets, ampersand
    assert metas[2]["title"] == 'Doc "2" — <étude> & co'
    assert metas[2]["links"] == [
        ("https://wat.example.org/p/3", "next 0"),
        ("https://wat.example.org/p/4", "next 1"),
    ]
    assert all(m["warc_ts"] == TS for m in metas)
    assert all(m["valid"] == 1 for m in metas)


def test_build_is_deterministic_and_plain_stream():
    assert build_wat(_entries(3)) == build_wat(_entries(3))
    plain = build_wat(_entries(3), gzip_per_record=False)
    assert plain.startswith(b"WARC/1.0")
    assert len(list(records_to_meta(plain))) == 3


def test_corrupt_json_is_error_as_data():
    # hand-build a metadata record whose payload is not JSON
    body = b"{not json"
    rec = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://wat.example.org/bad\r\n"
        b"WARC-Date: 2026-03-04T05:06:07Z\r\n"
        b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(body)}".encode()
        + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )
    good = build_wat(_entries(1), gzip_per_record=False)
    metas = list(records_to_meta(rec + good))
    assert len(metas) == 2
    bad = metas[0]
    assert bad["valid"] == 0 and bad["title"] is None and bad["links"] == []
    assert bad["url"] == "https://wat.example.org/bad"
    assert metas[1]["valid"] == 1


def test_missing_envelope_keys_and_null_title():
    # valid JSON but wrong shape → valid=0; absent Head → NULL title, valid=1
    import json

    shaped = build_wat(
        [{"url": "https://wat.example.org/t", "ts": TS, "links": []}],
        gzip_per_record=False,
    )
    metas = list(records_to_meta(shaped))
    assert metas[0]["valid"] == 1 and metas[0]["title"] is None

    body = json.dumps({"Envelope": {}}).encode()
    rec = (
        b"WARC/1.0\r\nWARC-Type: metadata\r\n"
        b"WARC-Target-URI: https://wat.example.org/shape\r\n"
        b"WARC-Date: 2026-03-04T05:06:07Z\r\n"
        b"Content-Type: application/json\r\n"
        + f"Content-Length: {len(body)}".encode()
        + b"\r\n\r\n"
        + body
        + b"\r\n\r\n"
    )
    assert list(records_to_meta(rec))[0]["valid"] == 0


def test_non_metadata_records_skipped():
    mixed = build_warc(
        [("https://wat.example.org/raw", TS, b"<html></html>")],
        gzip_per_record=False,
    ) + build_wat(_entries(2), gzip_per_record=False)
    assert len(list(records_to_meta(mixed))) == 2


def test_read_wat_binaryfile_path(spark, tmp_path):
    for seg in range(2):
        (tmp_path / f"seg-{seg}.wat.gz").write_bytes(
            build_wat(
                [
                    {
                        "url": f"https://wat.example.org/s{seg}/p/{i}",
                        "ts": TS,
                        "title": f"t{seg}-{i}",
                        "links": [(f"https://wat.example.org/s{seg}/p/{i+1}", "n")],
                    }
                    for i in range(3)
                ]
            )
        )
    df = read_wat(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 6
    r = rows["https://wat.example.org/s1/p/2"]
    assert r["title"] == "t1-2" and r["n_links"] == 1 and r["valid"] == 1
    assert r["links"][0]["url"] == "https://wat.example.org/s1/p/3"
    assert r["warc_ts"].replace(tzinfo=timezone.utc) == TS
