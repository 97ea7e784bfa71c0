"""Iceberg frontier-table adapter: probe, DDL strings, degraded-mode
roundtrip, and the zero-Exchange bucketed-join property."""

from pyspark.sql import functions as F

from uniparser_spark.sources.iceberg import (
    FrontierTable,
    compact_call,
    expire_snapshots_call,
    frontier_ddl,
    iceberg_available,
)


def _frontier_rows(spark, start, n, rnd):
    return spark.range(start, start + n).select(
        F.concat(F.lit("https://h"), (F.col("id") % 8).cast("string"),
                 F.lit(".example.org/p/"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("https://h"), (F.col("id") % 8).cast("string"),
                 F.lit(".example.org/p/"), F.col("id").cast("string")).alias("url_canon"),
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 8).cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.lit(0.5).alias("priority"),
        F.lit(rnd).cast("int").alias("round"),
    )


def test_iceberg_ddl_strings():
    ddl = frontier_ddl("glue.crawl.frontier", n_buckets=1024)
    assert "USING iceberg" in ddl
    assert "PARTITIONED BY (bucket(1024, url_hash))" in ddl
    assert "'write.distribution-mode'='hash'" in ddl
    assert "'format-version'='2'" in ddl
    call = compact_call("glue.crawl.frontier")
    assert call.startswith("CALL glue.system.rewrite_data_files(")
    assert "'target-file-size-bytes','536870912'" in call
    exp = expire_snapshots_call("crawl_frontier", retain_last=5)
    # bare table names fall back to the session catalog
    assert exp.startswith("CALL spark_catalog.system.expire_snapshots(")
    assert "retain_last => 5" in exp


def test_frontier_table_builtin_roundtrip_and_bucketed_plan(spark):
    # this environment carries no Iceberg jars: the probe must say so
    # (the adapter auto-degrades rather than failing at first write)
    assert iceberg_available(spark) is False

    ft = FrontierTable(spark, "t_frontier_a", n_buckets=8)
    ft2 = FrontierTable(spark, "t_frontier_b", n_buckets=8)
    assert ft.fmt == "builtin"
    try:
        ft.create()  # lazy in builtin mode
        ft.append(_frontier_rows(spark, 0, 500, rnd=0))
        ft.append(_frontier_rows(spark, 500, 300, rnd=1))  # delta append
        assert ft.exists()
        got = ft.read()
        assert got.count() == 800
        assert {r["round"] for r in got.select("round").distinct().collect()} == {0, 1}

        # maintenance verbs are Iceberg-only: degraded mode reports
        # no-op (the engine's inline compaction owns builtin state)
        assert ft.compact() is None
        assert ft.expire_snapshots() is None

        # the property the bucketing buys: seen-vs-candidates anti-join
        # between two bucketed frontier tables plans with ZERO Exchange
        ft2.append(_frontier_rows(spark, 600, 400, rnd=0))
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            cand = ft2.read().select("url_hash")
            seen = ft.read().select("url_hash")
            fresh = cand.join(seen, "url_hash", "left_anti")
            plan = fresh._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # and the join is still correct: seen covers ids 0..799, so
            # candidates 600..799 die and 800..999 come out fresh
            assert fresh.count() == 200
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        ft.drop()
        ft2.drop()
        assert not ft.exists()
