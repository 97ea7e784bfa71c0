"""DUST mining + crawl-trap detection (crawl/dust.py)."""

from pyspark.sql import functions as F

from uniparser_spark.crawl.dust import (
    apply_dust_rules,
    dust_param_rules,
    host_trap_stats,
    url_aliases,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, text string")


def test_url_aliases_alias_to_canonical(spark):
    pages = _pages(
        spark,
        [
            ("http://a.org/p?utm=1", "Same  Content"),
            ("http://a.org/p", "same content"),  # normalization folds case/ws
            ("http://a.org/p?ref=x", "same content"),
            ("http://a.org/unique", "other content"),
        ],
    )
    got = {
        (r["alias_url"], r["canonical_url"]) for r in url_aliases(pages).collect()
    }
    # canonical = min url of the group; one row per alias, none for the canonical
    assert got == {
        ("http://a.org/p?utm=1", "http://a.org/p"),
        ("http://a.org/p?ref=x", "http://a.org/p"),
    }


def test_dust_param_rules_votes_and_threshold(spark):
    aliases = spark.createDataFrame(
        [
            ("http://a.org/p?utm=1", "http://a.org/p", "f1"),
            ("http://a.org/q?utm=2&sess=z", "http://a.org/q", "f2"),
            ("http://a.org/r?keep=1&utm=3", "http://a.org/r?keep=1", "f3"),
            # path differs -> not a query-only alias, contributes nothing
            ("http://a.org/s?utm=4", "http://a.org/t", "f4"),
            # different host pair -> excluded
            ("http://b.org/p?utm=9", "http://c.org/p", "f5"),
        ],
        "alias_url string, canonical_url string, content_fp string",
    )
    got = {(r["host"], r["param"]): r["votes"] for r in dust_param_rules(aliases).collect()}
    # utm voted 3x on a.org; sess only once -> below min_votes=2
    assert got == {("a.org", "utm"): 3}
    low = {
        (r["host"], r["param"]): r["votes"]
        for r in dust_param_rules(aliases, min_votes=1).collect()
    }
    assert low[("a.org", "sess")] == 1


def test_apply_dust_rules_rewrites_candidates(spark):
    rules = spark.createDataFrame(
        [("a.org", "utm", 3), ("a.org", "sess", 2)], "host string, param string, votes long"
    )
    cands = spark.createDataFrame(
        [
            ("http://a.org/p?utm=1",),            # query becomes empty -> base
            ("http://a.org/p?keep=1&utm=2",),     # utm stripped, keep kept
            ("http://a.org/p?b=2&a=1",),          # untouched params keep order
            ("http://a.org/plain",),              # no query -> unchanged
            ("http://b.org/p?utm=1",),            # no rules for host -> unchanged
        ],
        "url_canon string",
    )
    got = [r["url_canon"] for r in apply_dust_rules(cands, rules).collect()]
    assert sorted(got) == sorted(
        [
            "http://a.org/p",
            "http://a.org/p?keep=1",
            "http://a.org/p?b=2&a=1",
            "http://a.org/plain",
            "http://b.org/p?utm=1",
        ]
    )


def test_apply_dust_rules_preserves_fragment_when_no_param_stripped(spark):
    """canonicalize_url preserves #fragments for reference parity, so a
    URL on a ruled host whose query matches NO rule must pass through
    byte-identical — fragment intact — both in the column form and the
    pure-Python twin."""
    from uniparser_spark.crawl.dust import strip_params_py

    rules = spark.createDataFrame(
        [("a.org", "utm", 3)], "host string, param string, votes long"
    )
    cands = spark.createDataFrame(
        [
            ("http://a.org/p?keep=1#sec2",),   # ruled host, no ruled param
            ("http://a.org/p?utm=1&k=2#sec2",),  # ruled param present
        ],
        "url_canon string",
    )
    got = sorted(r["url_canon"] for r in apply_dust_rules(cands, rules).collect())
    assert got == sorted(["http://a.org/p?keep=1#sec2", "http://a.org/p?k=2"])
    assert strip_params_py("http://a.org/p?keep=1#sec2", {"utm"}) == (
        "http://a.org/p?keep=1#sec2"
    )
    assert strip_params_py("http://a.org/p?utm=1&k=2#sec2", {"utm"}) == (
        "http://a.org/p?k=2"
    )


def test_approx_sketch_clamped_to_bounds(spark):
    """approx=True uses HLL, which can over-estimate distinct counts;
    the clamp keeps url_inflation >= 1 / trap_score, dup_frac in [0,1)
    on every host regardless of sketch error."""
    from uniparser_spark.textops.quality import host_quality_stats

    rows = [
        (f"https://h{i % 7}.org/p/{i}?s={i}", f"text {i % 13}") for i in range(400)
    ]
    traps = host_trap_stats(_pages(spark, rows), approx=True).collect()
    assert traps
    for r in traps:
        assert r["n_content"] <= r["n_urls"]
        assert r["url_inflation"] >= 1.0
        assert 0.0 <= r["trap_score"] < 1.0
    docs = spark.createDataFrame(
        [(f"h{i % 7}.org", f"doc body {i % 13}") for i in range(400)],
        "host string, text string",
    )
    for r in host_quality_stats(docs, approx=True).collect():
        assert 0.0 <= r["dup_frac"] < 1.0


def test_host_trap_stats_flags_trap_host(spark):
    # trap.org: 6 urls over 1 content blob, deep paths, all query-minted
    trap = [
        (f"http://trap.org/cal/2026/{i}?sess={i}", "trapped page") for i in range(6)
    ]
    good = [(f"http://good.org/a{i}", f"content {i}") for i in range(6)]
    stats = {r["host"]: r for r in host_trap_stats(_pages(spark, trap + good)).collect()}
    t, g = stats["trap.org"], stats["good.org"]
    assert t["n_urls"] == 6 and t["n_content"] == 1 and t["url_inflation"] == 6.0
    assert g["n_content"] == 6 and g["url_inflation"] == 1.0
    assert t["query_frac"] == 1.0 and g["query_frac"] == 0.0
    assert t["max_path_depth"] == 3 and g["max_path_depth"] == 1
    assert t["trap_score"] > 0.6 > g["trap_score"]


def test_trap_score_as_scheduler_budget(spark):
    """Trap stats -> budget: the trap host's budget collapses to 1 so
    only its best URL schedules, while the honest host drains fully."""
    from pyspark.sql import functions as F

    from uniparser_spark.frontier.politeness import schedule_batch

    trap = [(f"http://trap.org/c/{i}?s={i}", "same blob") for i in range(4)]
    good = [(f"http://good.org/a{i}", f"content {i}") for i in range(4)]
    budgets = host_trap_stats(_pages(spark, trap + good)).select(
        "host",
        F.when(F.col("trap_score") >= 0.5, F.lit(1)).otherwise(F.lit(10)).alias("budget"),
    )
    pending = spark.createDataFrame(
        [(u, u.split("/")[2]) for u, _ in trap + good],
        "url_canon string, host string",
    ).select(
        "url_canon", "host",
        F.lit(0.0).alias("priority"), F.lit(0).alias("depth"),
        F.lit(0).alias("discovered_round"),
        F.lit(None).cast("string").alias("parent_url"),
        F.lit(0).alias("list_index"),
    )
    out = schedule_batch(pending, budgets=budgets)
    sched = {r["url_canon"] for r in out.collect() if r["scheduled"]}
    assert sum(u.startswith("http://trap.org") for u in sched) == 1
    assert sum(u.startswith("http://good.org") for u in sched) == 4


def test_url_templates_shapes(spark):
    from uniparser_spark.crawl.dust import url_templates

    pages = spark.createDataFrame(
        [
            ("https://a.org/item-1/",),
            ("https://a.org/item-22/",),
            ("https://a.org/blob/0123456789abcdef0123/raw",),
            ("https://a.org/blob/fedcba9876543210fedc/raw",),
            ("https://a.org/p?id=5&ref=x",),
            ("https://a.org/p?id=6&ref=y",),
            ("https://a.org/one-off/7",),  # below min_urls
        ],
        "url string",
    )
    got = {r["template"]: r for r in url_templates(pages).collect()}
    assert set(got) == {
        "a.org/item-{n}/",
        "a.org/blob/{hex}/raw",
        "a.org/p?id={v}&ref={v}",
    }
    assert got["a.org/item-{n}/"]["n_urls"] == 2
    assert got["a.org/item-{n}/"]["example_url"] == "https://a.org/item-1/"


def test_dust_rewrite_parity_fuzz(spark):
    """Property fuzz: the native apply_dust_rules rewrite and its
    pure-Python twin strip_params_py agree on arbitrary query-string
    shapes (empty values, missing '=', repeated keys, '&&', trailing
    separators, fragments)."""
    from hypothesis import given, settings, strategies as st

    from uniparser_spark.crawl.dust import strip_params_py

    key = st.sampled_from(["utm", "sess", "keep", "a", "", "x y"])
    val = st.sampled_from(["", "1", "a=b", "%20", "é"])
    kv = st.tuples(key, val).map(lambda t: t[0] + ("=" + t[1] if t[1] else ""))
    query = st.lists(kv, min_size=0, max_size=4).map("&".join)
    frag = st.sampled_from(["", "#f", "#a?b=1"])

    collected = []

    @settings(max_examples=150, deadline=None)
    @given(query, frag, st.booleans())
    def gen(q, fr, with_q):
        url = "http://d.org/p" + (("?" + q) if with_q else "") + fr
        collected.append(url)

    gen()
    urls = sorted(set(collected))
    drop = {"utm", "sess"}
    rules = spark.createDataFrame(
        [("d.org", p, 9) for p in sorted(drop)], "host string, param string, votes long"
    )
    cands = spark.createDataFrame([(u,) for u in urls], "url_canon string")
    from pyspark.sql import functions as F

    got = {
        r["_orig"]: r["url_canon"]
        for r in apply_dust_rules(
            cands.withColumn("_orig", F.col("url_canon")), rules
        ).collect()
    }
    for u in urls:
        assert got[u] == strip_params_py(u, drop), repr(u)


# ------------------------------------------------------ path prefixes
def test_path_prefix_stats_localizes_trap_subtree(spark):
    from uniparser_spark.crawl.dust import path_prefix_stats

    pages = spark.createDataFrame(
        [
            ("https://a.org/cal/1/2", "same"),
            ("https://a.org/cal/1/3", "same"),
            ("https://a.org/cal/2", "same"),
            ("https://a.org/blog/x", "post x"),
            ("https://a.org/blog/y", "post y"),
            ("https://a.org/", "root"),
        ],
        "url string, text string",
    )
    out = {
        (r["host"], r["prefix"]): r.asDict()
        for r in path_prefix_stats(pages, min_urls=1).collect()
    }
    # root URL (zero segments) contributes no phantom '/' rows
    assert ("a.org", "/") not in out
    cal = out[("a.org", "/cal")]
    assert cal["depth"] == 1 and cal["n_urls"] == 3
    assert cal["n_content"] == 1 and cal["max_seen_depth"] == 3
    assert cal["dup_frac"] == round(1 - 1 / 3, 6)
    blog = out[("a.org", "/blog")]
    assert blog["n_content"] == 2 and blog["dup_frac"] == 0.0
    # depth-2 rows exist under both subtrees
    assert out[("a.org", "/cal/1")]["depth"] == 2
    assert out[("a.org", "/cal/1")]["n_urls"] == 2
    # min_urls prunes singleton leaves
    pruned = path_prefix_stats(pages, min_urls=2)
    assert {r["prefix"] for r in pruned.collect()} == {"/cal", "/cal/1", "/blog"}
