"""Gap-based sessionization of fetch/event logs.

A crawl operations pipeline reads its own fetch log constantly: "how
long do we stay on a host per visit", "how many fetches per politeness
session", "did the adaptive-delay change shorten host sessions".  The
classic primitive is GAP SESSIONIZATION: order a key's events by time
and cut a new session whenever the gap to the previous event exceeds a
threshold.  The reference engine has no log analytics at all (its
crawler is a single asyncio loop — ``crawler.py:191-224`` keeps no
fetch history); this is part of the beyond-reference ops surface.

Scale shape: ONE Exchange total (measured plan, PLANS.md).  The
``lag`` that measures the gap and the running ``sum`` that numbers
sessions share partitioning and ordering, so both windows run over the
single sort; and the closing groupBy(key, session_id) adds NO second
Exchange — its grouping keys are a superset of the window's hash
partitioning key, so Spark's ClusteredDistribution is already
satisfied and the aggregate runs in place.  Keys
are hosts/users (bounded per-key row counts); a pathological hot key
degrades the sort, not the cluster — same skew posture as the
politeness scheduler, and the same salting applies if needed.

Determinism: ordering ties break on the event id, timestamps are
compared in integer microseconds (``unix_micros`` / DuckDB
``epoch_us``), and durations use integer division — no floats anywhere,
so the DuckDB oracle is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_sec: int = 1800,
) -> DataFrame:
    """Cut each key's event stream into sessions at > ``gap_sec`` gaps.

    Output one row per session: ``(key, session_id, n_events,
    first_event, start_us, end_us, duration_sec)`` with 1-based
    ``session_id`` in time order.
    """
    # testdata timestamps are TIMESTAMP_NTZ; the session tz is pinned to
    # UTC (engine/session.py:55) so the cast is offset-free and matches
    # DuckDB's epoch_us over the same naive values.
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(us.asc(), F.col(id_col).asc())
    gap_us = int(gap_sec) * 1_000_000
    prev = F.lag(us).over(w)
    new_session = (
        prev.isNull() | ((us - prev) > F.lit(gap_us))
    ).cast("long")
    numbered = df.select(
        F.col(key_col),
        F.col(id_col),
        us.alias("_us"),
        F.sum(new_session)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_id"),
    )
    return (
        numbered.groupBy(key_col, "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(id_col).alias("first_event"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
        )
        .select(
            key_col,
            "session_id",
            "n_events",
            "first_event",
            "start_us",
            "end_us",
            F.expr("(end_us - start_us) div 1000000").alias("duration_sec"),
        )
    )
