"""Structured Streaming surface: incremental page ingestion + extraction.

The round-based crawl (crawl/engine.py) is the right execution model for
frontier scheduling — the reference's crawl is inherently round-shaped
(SURVEY.md §1.5).  But the *extraction* side is a pure per-row
transformation, so it composes directly with Structured Streaming for
continuous-ingestion deployments: pages land in a directory/Kafka topic,
the same compiled-rule ``mapInPandas`` runs incrementally, and sinks
receive exactly-once micro-batches with checkpointed progress.

Two operators:

- :func:`extract_stream` — streaming pages → streaming extraction
  results (same fused UDF as the batch path; rule compilation is
  per-executor-process, so micro-batches reuse compiled rules).
- :func:`host_rate_metrics` — event-time windowed per-host page counts
  with a watermark for late data: the streaming analogue of the
  crawl's per-round metrics table.
"""

from __future__ import annotations

from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .engine.extract import extract_pages
from .testgen import PAGES_SCHEMA


def read_pages_stream(
    spark: SparkSession,
    input_dir: str,
    schema=PAGES_SCHEMA,
    max_files_per_trigger: Optional[int] = None,
) -> DataFrame:
    """Stream a Common-Crawl-style page directory (parquet files appear
    as upstream fetchers land them)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def extract_stream(
    pages: DataFrame,
    storage: Any,
    text_col: str = "text",
    html_col: Optional[str] = None,
) -> DataFrame:
    """Streaming extraction: identical semantics to the batch
    ``extract_pages`` — one Arrow crossing per micro-batch partition,
    errors as data."""
    return extract_pages(pages, storage, text_col=text_col, html_col=html_col)


def host_rate_metrics(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Per-host page-rate over event-time windows with late-data bound.

    Streaming aggregation state is keyed by (window, host); the
    watermark lets Spark drop state for closed windows, so the query
    runs indefinitely in bounded memory.
    """
    host = F.regexp_extract(F.col("url"), r"^https?://([^/:]+)", 1)
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("win"), host.alias("host"))
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length(F.col("text"))).alias("bytes_text"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "n_pages",
            "bytes_text",
        )
    )


def dedup_stream(
    pages: DataFrame,
    url_col: str = "url",
    n_buckets: int = 32,
) -> DataFrame:
    """Custom stateful streaming operator: exactly-once URL dedup across
    micro-batches via ``applyInPandasWithState``.

    State = the set of seen xxhash64 keys per hash bucket (the same
    sharding as the batch seen-filter, so state volume per group is
    bounded and the shuffle key is skew-free).  First occurrence of a
    URL passes through; repeats in the same or any later micro-batch
    are dropped.  This is the streaming twin of the frontier's
    anti-join dedup — use it when pages arrive continuously instead of
    in crawl rounds.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = pages.schema
    cols = [f.name for f in pages.schema.fields]

    def fn(key, pdfs: Iterator[pd.DataFrame], state: "GroupState") -> Iterator[pd.DataFrame]:
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh_rows = []
            for idx, h in zip(pdf.index, pdf["_h"]):
                h = int(h)
                if h not in seen:
                    seen.add(h)
                    fresh_rows.append(idx)
            if fresh_rows:
                yield pdf.loc[fresh_rows, cols]
        state.update((list(seen),))

    keyed = pages.withColumn("_h", F.xxhash64(F.col(url_col))).withColumn(
        "_bucket", F.pmod(F.col("_h"), F.lit(n_buckets)).cast("int")
    )
    return keyed.groupBy("_bucket").applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType="hashes array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_to_parquet(
    result: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    output_mode: str = "append",
):
    """Start the sink with checkpointing; ``available_now`` drains all
    currently-visible input then stops (the batch-compatible trigger
    used by tests and backfills)."""
    writer = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode(output_mode)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def session_stream(
    events: DataFrame,
    key_col: str = "host",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: int = 1800,
    flush_col: str = "flush",
) -> DataFrame:
    """Streaming twin of :func:`~uniparser_spark.crawl.sessions.
    sessionize`: gap-based sessionization as a custom stateful operator
    (``applyInPandasWithState``), emitting each session exactly once —
    when it CLOSES (a later event arrives past ``gap_sec``, or a
    flush sentinel lands).

    State per key is O(1): ``(session_id, start_us, last_us, n_events,
    first_event)`` for the one open session — a host's full history
    never accumulates, so state volume is bounded by the live key set
    regardless of stream length.  Rows where ``flush_col`` = 1 are
    control events: they close any open session without starting one
    (the drain protocol for bounded runs / graceful shutdown — the
    caller appends one sentinel per key after the data; an unbounded
    deployment would use an event-time timeout instead, same close
    semantics).

    Ordering contract: events are sorted within each micro-batch, but
    CROSS-batch reordering must be bounded by the source (land files
    in time order / use a watermarked upstream) — same discipline
    every incremental sessionizer requires.  Emitted schema matches
    the batch operator exactly: ``(key, session_id, n_events,
    first_event, start_us, end_us, duration_sec)`` with 1-based
    session ids in time order, so a drained sink is oracle-checkable
    against batch SQL.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_sec) * 1_000_000
    out_schema = (
        f"{key_col} string, session_id long, n_events long, "
        "first_event long, start_us long, end_us long, duration_sec long"
    )

    def fn(key, pdfs: Iterator[pd.DataFrame], state: "GroupState") -> Iterator[pd.DataFrame]:
        sid, start, last, n, first = (
            state.get if state.exists else (0, None, None, 0, None)
        )
        closed = []

        def close():
            nonlocal start, last, n, first
            if start is not None:
                closed.append(
                    (key[0], sid, n, first, start, last, (last - start) // 1_000_000)
                )
                start, last, n, first = None, None, 0, None

        for pdf in pdfs:
            pdf = pdf.sort_values(["_us", "_id"])
            for us, eid, fl in zip(pdf["_us"], pdf["_id"], pdf["_fl"]):
                us, eid = int(us), int(eid)
                if int(fl):
                    close()
                    continue
                if start is not None and us - last > gap_us:
                    close()
                if start is None:
                    sid += 1
                    start, n, first = us, 0, eid
                last = us
                n += 1
                first = min(first, eid)
        state.update((sid, start, last, n, first))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=[
                    key_col, "session_id", "n_events", "first_event",
                    "start_us", "end_us", "duration_sec",
                ],
            )

    keyed = events.select(
        F.col(key_col),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).cast("long").alias("_id"),
        F.coalesce(F.col(flush_col), F.lit(0)).cast("int").alias("_fl"),
    )
    return keyed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=(
            "session_id long, start_us long, last_us long, "
            "n_events long, first_event long"
        ),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
