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

from typing import Any, Optional

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
