"""Cuckoo-filter sidecar: membership (no false negatives), bounded
false-positive rate, and deletion → re-admission (the recrawl path)."""

from pyspark.sql import functions as F

from uniparser_spark.frontier.cuckoo import CuckooSeenFilter
from uniparser_spark.frontier.seen import add_url_keys


def _urls(spark, lo, hi):
    df = spark.range(lo, hi).select(
        F.concat(F.lit("https://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".example.org/p/"), F.col("id").cast("string")).alias("url")
    )
    return add_url_keys(df).select("url", "url_hash")


def test_cuckoo_membership_and_fp_rate(spark):
    seen = _urls(spark, 0, 3000)
    new = _urls(spark, 3000, 6000)
    cf = CuckooSeenFilter(n_buckets=8)
    state = cf.build(seen).cache()

    flagged_seen = cf.probe(seen, state)
    assert flagged_seen.filter(~F.col("maybe_seen")).count() == 0  # no false negatives

    flagged_new = cf.probe(new, state)
    fp = flagged_new.filter(F.col("maybe_seen")).count() / 3000
    assert fp < 0.01, f"cuckoo false-positive rate too high: {fp}"


def test_cuckoo_delete_readmits(spark):
    seen = _urls(spark, 0, 2000).cache()
    cf = CuckooSeenFilter(n_buckets=4)
    state = cf.build(seen)

    expired = seen.filter(F.col("url_hash") % 5 == 0).cache()
    kept = seen.join(expired.select("url_hash"), "url_hash", "left_anti")
    n_expired = expired.count()
    assert n_expired > 0

    updated = cf.delete(state, expired).cache()
    # expired keys are gone (modulo other keys sharing their fingerprint+slots)
    readmitted = cf.probe(expired, updated).filter(~F.col("maybe_seen")).count()
    assert readmitted >= n_expired * 0.95
    # untouched keys still have no false negatives
    assert cf.probe(kept, updated).filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_grows_on_underestimated_capacity(spark):
    # expected_total lies by 50x: shards must grow-and-rebuild rather
    # than silently drop keys (the no-false-negatives contract)
    seen = _urls(spark, 0, 5000)
    cf = CuckooSeenFilter(n_buckets=2, min_indexes=8)
    state = cf.build(seen, expected_total=100).cache()
    flagged = cf.probe(seen, state)
    assert flagged.filter(~F.col("maybe_seen")).count() == 0
