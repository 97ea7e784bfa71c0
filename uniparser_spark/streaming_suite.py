"""Oracle-gated Structured Streaming queries (driver-contract entries).

Each function runs a REAL streaming query (``readStream`` file source →
transformation → checkpointed sink with ``availableNow``) and returns
the drained result as a batch DataFrame, so the driver's DuckDB oracle
can value-check the streaming surface exactly like the batch operators:

- ``stream_host_rates`` — :func:`~uniparser_spark.streaming.host_rate_metrics`
  (event-time window + watermark agg) over a documents-derived page
  stream; final ``complete``-mode state must equal the batch group-by.
- ``stream_extract``    — :func:`~uniparser_spark.streaming.extract_stream`
  (the fused compiled-rule mapInPandas) incrementally over micro-batches;
  the parquet sink must hold byte-identical extractions.
- ``stream_dedup``      — :func:`~uniparser_spark.streaming.dedup_stream`
  (``applyInPandasWithState``): the same rows landed twice as separate
  files are drained in multiple micro-batches and the stateful operator
  must emit each URL exactly once (cross-batch state), i.e. DISTINCT.

Reference semantics: the crawl loop's incremental fetch+parse
(crawler.py:156-189) — pages arrive continuously, extraction and seen
state update incrementally with exactly-once restarts.

Everything here derives deterministically from the driver's
``documents`` table (no wall-clock, no randomness in data), so the
oracles are plain ANSI SQL over the same parquet.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from .streaming import dedup_stream, extract_stream, host_rate_metrics, run_to_parquet
from .testgen import BASE_EPOCH


def _docs_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a file-source stream (explicit schema: the
    streaming source cannot infer, and an explicit schema doubles as
    projection).  The file-stream source requires a DIRECTORY, so the
    single parquet file is symlinked into a scratch dir (no copy)."""
    src = os.path.abspath(f"{sf_dir}/documents.parquet")
    stream_dir = tempfile.mkdtemp(prefix="us_docs_stream_")
    os.symlink(src, os.path.join(stream_dir, "documents.parquet"))
    schema = spark.read.parquet(src).schema
    return spark.readStream.schema(schema).parquet(stream_dir)


def _doc_url(host_expr) -> F.Column:
    return F.concat(F.lit("https://"), host_expr, F.lit("/d/"), F.col("doc_id").cast("string"))


def _await(query, timeout: int = 300) -> None:
    if not query.awaitTermination(timeout):
        query.stop()
        raise TimeoutError("streaming query did not drain within timeout")


def q_stream_host_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time windowed per-host page rates with a watermark, drained
    with ``availableNow`` into a complete-mode memory sink; the final
    state is the oracle-checkable aggregate.  Timestamps derive from
    doc_id (BASE_EPOCH + doc_id minutes) so window starts are
    SQL-computable; session tz pinned UTC so the tz-aware window op is
    wall-clock-stable."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    host = F.concat(F.lit("h"), (F.col("doc_id") % 7).cast("string"), F.lit(".example.org"))
    ts = F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("doc_id") * 60)
    pages = _docs_stream(spark, sf_dir).select(
        _doc_url(host).alias("url"), ts.alias("warc_ts"), F.col("text")
    )
    metrics = host_rate_metrics(pages, window="1 hour", watermark="2 hours")
    name = f"stream_host_rates_{uuid.uuid4().hex[:8]}"
    q = (
        metrics.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    _await(q)
    return spark.table(name).select(
        F.col("win_start").cast("timestamp_ntz").cast("string").alias("win_start"),
        "host",
        "n_pages",
        "bytes_text",
    )


def q_stream_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused compiled-rule extraction running INSIDE a streaming
    query (micro-batched mapInPandas) with a checkpointed parquet sink;
    the drained sink must match the batch regex oracle byte-for-byte."""
    from .suite import _single_host_storage  # lazy: suite imports this module

    pages = _docs_stream(spark, sf_dir).select(
        _doc_url(F.lit("docs.example.org")).alias("url"), F.col("text")
    )
    storage = _single_host_storage(
        "docs.example.org",
        "r",
        r"^https://docs\.example\.org/d/\d+$",
        [{"name": "s", "chain_rules": [["re", "[aeiou]", "@_"]], "child_rules": []}],
    )
    base = tempfile.mkdtemp(prefix="us_stream_extract_")
    out_dir, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    _await(run_to_parquet(extract_stream(pages, storage), out_dir, ck))
    return spark.read.parquet(out_dir).select(
        "url", F.get_json_object("result", "$.r.s").alias("devoweled")
    )


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful cross-micro-batch URL dedup: the same URL set is landed
    TWICE as separate files, drained in >=2 micro-batches
    (maxFilesPerTrigger), and ``applyInPandasWithState`` must pass each
    URL through exactly once — the streaming twin of the frontier's
    seen anti-join.  Output (one row per distinct URL) is order- and
    winner-independent, hence oracle-stable."""
    urls = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(_doc_url(F.lit("docs.example.org")).alias("url"))
    )
    base = tempfile.mkdtemp(prefix="us_stream_dedup_")
    in_dir, out_dir, ck = (os.path.join(base, d) for d in ("in", "out", "ck"))
    for _ in range(2):  # two lands = duplicate arrivals in later batches
        urls.coalesce(2).write.mode("append").parquet(in_dir)
    stream = (
        spark.readStream.schema("url string")
        .option("maxFilesPerTrigger", 2)
        .parquet(in_dir)
    )
    _await(run_to_parquet(dedup_stream(stream, n_buckets=8), out_dir, ck))
    return spark.read.parquet(out_dir).select("url")


def q_stream_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text link extraction running INSIDE a streaming query:
    the same one-Arrow-crossing DOM walk (crawl/links.py) composes with
    readStream unchanged (mapInPandas is micro-batch-transparent), so
    link discovery keeps up with page arrival — the incremental half of
    the crawl loop's frontier expansion.  Drained sink must match the
    batch links_extract oracle field-for-field."""
    from .crawl.links import links_from_html

    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 7).cast("string"), F.lit(".example.org"))
    url = F.concat(F.lit("https://"), host, F.lit("/d/"), d.cast("string"))
    html = F.concat(
        F.lit('<html><body><p>intro</p><a href="/d/'),
        (d * 2).cast("string"),
        F.lit('">next  <b>item</b></a><a href="https://ext.example.net/e/'),
        d.cast("string"),
        F.lit('?x=1" rel="nofollow">ext '),
        d.cast("string"),
        F.lit('</a><a href="#top">skip</a></body></html>'),
    )
    pages = _docs_stream(spark, sf_dir).select(url.alias("url"), html.alias("html"))
    base = tempfile.mkdtemp(prefix="us_stream_links_")
    out_dir, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    _await(run_to_parquet(links_from_html(pages), out_dir, ck))
    return spark.read.parquet(out_dir)


def q_stream_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus admission INSIDE a streaming query: per-page robots
    directives (frontier/robots.page_directives — the same DOM walk the
    batch op runs) composed with readStream, noindex pages filtered
    before the sink.  The synthesis mirrors q_page_directives (five
    meta/header regimes incl. a decoy description meta); the drained
    sink holds exactly the admitted pages with their remaining flags."""
    from .frontier.robots import page_directives

    d = F.col("doc_id")
    url = F.concat(F.lit("https://m.example.org/p/"), d.cast("string"))
    meta = (
        F.when(d % 5 == 1, F.lit('<meta name="robots" content="noindex">'))
        .when(d % 5 == 2, F.lit('<meta content="NOFOLLOW , noarchive" name="ROBOTS">'))
        .when(d % 5 == 3, F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit(""))
    )
    html = F.concat(
        F.lit('<html><head><meta name="description" content="nofollow">'),
        meta,
        F.lit("</head><body>p"),
        d.cast("string"),
        F.lit("</body></html>"),
    )
    header = F.when(d % 5 == 4, F.lit("noindex")).otherwise(
        F.lit(None).cast("string")
    )
    pages = _docs_stream(spark, sf_dir).select(
        url.alias("url"), html.alias("html"), header.alias("xrt")
    )
    admitted = page_directives(pages, header_col="xrt").filter(
        F.col("noindex") == 0
    )
    base = tempfile.mkdtemp(prefix="us_stream_admission_")
    out_dir, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    _await(run_to_parquet(admitted, out_dir, ck))
    return spark.read.parquet(out_dir).select("url", "nofollow", "noarchive")


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization INSIDE a streaming query (streaming.py
    session_stream, applyInPandasWithState with O(1) per-key state):
    a fetch log over 7 hosts (per-host sequence k = doc_id div 7,
    60 s cadence, an hour jump every 10th event) lands as THREE
    time-ordered files drained one per micro-batch — the k=20..29
    session straddles the batch boundary, so cross-batch state carry
    is exercised for real — then a per-host flush sentinel closes the
    tails.  The drained sink must equal the batch sessionize oracle
    row-for-row."""
    from .streaming import session_stream

    d = F.col("doc_id")
    k = F.expr("doc_id div 7")
    ev = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.concat(F.lit("h"), (d % 7).cast("string")).alias("host"),
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + k * 60 + F.expr("(doc_id div 7) div 10") * 3600
        ).alias("ts"),
        d.alias("event_id"),
        F.lit(0).alias("flush"),
        k.alias("_k"),
    )
    sentinels = ev.select("host").distinct().select(
        "host",
        F.timestamp_seconds(F.lit(BASE_EPOCH + 10_000_000)).alias("ts"),
        F.lit(-1).cast("long").alias("event_id"),
        F.lit(1).alias("flush"),
    )
    base = tempfile.mkdtemp(prefix="us_stream_sessions_")
    in_dir, out_dir, ck = (os.path.join(base, p) for p in ("in", "out", "ck"))
    cols = ["host", "ts", "event_id", "flush"]

    def land(df, stamp):
        # the file source orders micro-batches by mtime; rapid writes can
        # collide on coarse filesystem timestamps, so pin them explicitly
        before = set(os.listdir(in_dir)) if os.path.isdir(in_dir) else set()
        df.coalesce(1).write.mode("append").parquet(in_dir)
        for name in set(os.listdir(in_dir)) - before:
            os.utime(os.path.join(in_dir, name), (stamp, stamp))

    land(ev.filter(F.col("_k") < 25).select(cols), 1_000_000_000)
    land(ev.filter(F.col("_k") >= 25).select(cols), 1_000_000_100)
    land(sentinels, 1_000_000_200)
    stream = (
        spark.readStream.schema(
            "host string, ts timestamp, event_id long, flush int"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    _await(
        run_to_parquet(
            session_stream(stream, gap_sec=1800), out_dir, ck
        )
    )
    return spark.read.parquet(out_dir)


def q_stream_triage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC JOIN: fetch events arriving as a stream are
    triaged against a static per-host reputation table computed in
    batch (the deployment shape: frontier events stream in, the
    reputation rollup is last round's materialized table).  The static
    side broadcasts under every micro-batch — no stream-side shuffle —
    and the triage CASE is pure codegen.  5xx on a low-reputation host
    backs off the whole host; 5xx on a healthy host just retries the
    URL; 404s drop.  Drained sink must equal the batch join oracle."""
    d = F.col("doc_id")
    host = F.concat(F.lit("h"), (d % 11).cast("string"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rep = (
        docs.select(host.alias("host"), d.alias("_d"))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_prior"),
            F.sum((F.col("_d") % 7 == 0).cast("int")).alias("_bad"),
        )
        .select(
            "host",
            "n_prior",
            F.round(1 - F.col("_bad") / F.col("n_prior"), 6).alias("rep_score"),
        )
    )
    status = (
        F.when(d % 9 == 0, F.lit(503))
        .when(d % 13 == 0, F.lit(404))
        .otherwise(F.lit(200))
    )
    events = _docs_stream(spark, sf_dir).select(
        _doc_url(host).alias("url"), host.alias("host"), status.alias("status")
    )
    joined = events.join(F.broadcast(rep), "host", "left")
    action = (
        F.when((F.col("status") >= 500) & (F.col("rep_score") < 0.9), F.lit("backoff_host"))
        .when(F.col("status") >= 500, F.lit("retry_url"))
        .when(F.col("status") == 404, F.lit("drop"))
        .otherwise(F.lit("ok"))
    )
    out = joined.select(
        "url", "host", "status", "n_prior", "rep_score", action.alias("action")
    )
    base = tempfile.mkdtemp(prefix="us_stream_triage_")
    out_dir, ck = os.path.join(base, "out"), os.path.join(base, "ck")
    _await(run_to_parquet(out, out_dir, ck))
    return spark.read.parquet(out_dir)


STREAM_QUERIES = {
    "stream_host_rates": q_stream_host_rates,
    "stream_extract": q_stream_extract,
    "stream_dedup": q_stream_dedup,
    "stream_links": q_stream_links,
    "stream_sessions": q_stream_sessions,
    "stream_triage": q_stream_triage,
    "stream_admission": q_stream_admission,
}

STREAM_ORACLES = {
    # Spark's tumbling window aligns to the epoch: floor(epoch/3600)*3600.
    "stream_host_rates": f"""
        SELECT CAST(make_timestamp(
                 (({BASE_EPOCH} + doc_id * 60) // 3600) * 3600 * 1000000
               ) AS VARCHAR) AS win_start,
               'h' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host,
               COUNT(*) AS n_pages,
               CAST(SUM(length(text)) AS BIGINT) AS bytes_text
        FROM documents
        GROUP BY 1, 2
    """,
    "stream_extract": """
        SELECT 'https://docs.example.org/d/' || doc_id AS url,
               regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
        FROM documents
    """,
    "stream_dedup": """
        SELECT DISTINCT 'https://docs.example.org/d/' || doc_id AS url
        FROM documents
    """,
    "stream_admission": """
        SELECT 'https://m.example.org/p/' || CAST(doc_id AS VARCHAR) AS url,
               CAST(CASE WHEN doc_id % 5 IN (2, 3) THEN 1 ELSE 0 END AS INT)
                 AS nofollow,
               CAST(CASE WHEN doc_id % 5 = 2 THEN 1 ELSE 0 END AS INT)
                 AS noarchive
        FROM documents
        WHERE doc_id % 5 NOT IN (1, 3, 4)
    """,
    "stream_sessions": """
        WITH e AS (
          SELECT 'h' || (doc_id % 7) AS host,
                 (1580732985 + (doc_id // 7) * 60
                  + ((doc_id // 7) // 10) * 3600) * 1000000 AS us,
                 doc_id AS event_id
          FROM documents),
        n AS (
          SELECT host, event_id, us,
                 CASE WHEN lag(us) OVER w IS NULL
                        OR us - lag(us) OVER w > 1800000000
                      THEN 1 ELSE 0 END AS ns
          FROM e
          WINDOW w AS (PARTITION BY host ORDER BY us, event_id)),
        s AS (
          SELECT host, event_id, us,
                 SUM(ns) OVER (PARTITION BY host ORDER BY us, event_id)
                   AS session_id
          FROM n)
        SELECT host, CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events, MIN(event_id) AS first_event,
               MIN(us) AS start_us, MAX(us) AS end_us,
               (MAX(us) - MIN(us)) // 1000000 AS duration_sec
        FROM s GROUP BY host, session_id
    """,
    "stream_triage": """
        WITH rep AS (
          SELECT 'h' || (doc_id % 11) AS host, count(*) AS n_prior,
                 ROUND(1 - SUM(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                           / CAST(count(*) AS DOUBLE), 6) AS rep_score
          FROM documents GROUP BY 1),
        ev AS (
          SELECT 'https://h' || (doc_id % 11) || '/d/' || doc_id AS url,
                 'h' || (doc_id % 11) AS host,
                 CASE WHEN doc_id % 9 = 0 THEN 503
                      WHEN doc_id % 13 = 0 THEN 404 ELSE 200 END AS status
          FROM documents)
        SELECT e.url, e.host, CAST(e.status AS INT) AS status,
               r.n_prior, r.rep_score,
               CASE WHEN e.status >= 500 AND r.rep_score < 0.9
                      THEN 'backoff_host'
                    WHEN e.status >= 500 THEN 'retry_url'
                    WHEN e.status = 404 THEN 'drop'
                    ELSE 'ok' END AS action
        FROM ev e LEFT JOIN rep r ON e.host = r.host
    """,
}
