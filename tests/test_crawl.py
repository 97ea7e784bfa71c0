"""End-to-end crawl: Spark BFS rounds vs the pure-Python reference
simulator — nested results and seen-set membership must match."""

import json

import pytest

from uniparser_spark import JSONRuleStorage, testgen
from uniparser_spark.crawl import CrawlEngine, simulate_crawl
from uniparser_spark.urls import canonicalize_url


def _page_store(pages_df):
    return {r["url"]: r["text"] for r in pages_df.collect()}


@pytest.fixture(scope="module")
def corpus(spark):
    pages = testgen.generate_pages(spark, n_hosts=3, n_details=15).cache()
    storage_json = testgen.storage_json(3, keep_first=3)
    return pages, storage_json, _page_store(pages)


def test_crawl_matches_simulator(spark, corpus, tmp_path):
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]

    engine = CrawlEngine(spark, pages, storage_json, tmp_path / "state", state_partitions=4)
    engine.seed(seeds)
    rounds = engine.run(max_rounds=10)
    assert rounds[-1]["done"] or rounds[-1]["scheduled"] == 0
    assert len(rounds) == 3  # seeds, details, empty-finish

    got = engine.assemble_results(seeds)

    storage = JSONRuleStorage(**json.loads(storage_json))
    seen_sim: dict = {}
    expected = [simulate_crawl(storage, store, u, seen=seen_sim) for u in seeds]
    assert got == expected

    # seen-set membership identical to the simulator's
    engine_seen = {r["url_canon"] for r in engine.seen().collect()}
    assert engine_seen == set(seen_sim.keys())

    # spot-check shape: nested __result__ list with extracted titles in list order
    host0 = testgen.host_name(0)
    payload = got[0]["list"]
    assert payload["__request__"] == [testgen.detail_url(host0, k) for k in range(3)]
    assert payload["__result__"] == [
        {"detail": {"title": f"Item {k} – synthetic page on {host0}"}} for k in range(3)
    ]


def test_crawl_resume_from_checkpoint(spark, corpus, tmp_path):
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]
    state = tmp_path / "state_resume"

    first = CrawlEngine(spark, pages, storage_json, state, state_partitions=4)
    first.seed(seeds)
    first.run_round()  # crawl only the seeds, then "crash"

    resumed = CrawlEngine(spark, pages, storage_json, state, state_partitions=4)
    assert resumed.read_manifest()["round"] == 1
    resumed.run(max_rounds=10)

    storage = JSONRuleStorage(**json.loads(storage_json))
    seen_sim: dict = {}
    expected = [simulate_crawl(storage, store, u, seen=seen_sim) for u in seeds]
    assert resumed.assemble_results(seeds) == expected
    assert {r["url_canon"] for r in resumed.seen().collect()} == set(seen_sim.keys())


def test_crawl_politeness_budget_rounds(spark, corpus, tmp_path):
    """budget=1 on a host => its 3 detail pages take 3 rounds; final
    results still identical (politeness changes schedule, not results)."""
    pages, storage_json, store = corpus
    host0 = testgen.host_name(0)
    seeds = [testgen.list_url(host0)]
    budgets = spark.createDataFrame([(host0, 1)], "host string, budget int")

    engine = CrawlEngine(
        spark, pages, storage_json, tmp_path / "state_budget", budgets=budgets, state_partitions=4
    )
    engine.seed(seeds)
    rounds = engine.run(max_rounds=10)
    scheduled_per_round = [r["scheduled"] for r in rounds if r["scheduled"]]
    assert scheduled_per_round == [1, 1, 1, 1]  # list page, then one detail per round

    storage = JSONRuleStorage(**json.loads(storage_json))
    expected = [simulate_crawl(storage, store, seeds[0], seen={})]
    assert engine.assemble_results(seeds) == expected


def test_crawl_rule_miss_and_fetch_miss(spark, tmp_path):
    pages = testgen.generate_pages(spark, n_hosts=1, n_details=3)
    # storage whose list rule requests a page that is absent from the store
    storage = testgen.build_storage(1, keep_first=3)
    host = testgen.host_name(0)
    storage[host]["crawler_rules"]["list"]["parse_rules"][0]["chain_rules"] = [
        ["udf", f"['https://{host}/item-000000/', 'https://{host}/item-999999/', 'https://other.org/x/']", ""]
    ]
    import uniparser_spark.config as cfg

    engine = CrawlEngine(spark, pages, cfg.json_dumps(storage), tmp_path / "state_miss", state_partitions=2)
    engine.seed([testgen.list_url(host)])
    engine.run(max_rounds=5)
    [result] = engine.assemble_results([testgen.list_url(host)])
    children = result["list"]["__result__"]
    assert children[0] == {"detail": {"title": f"Item 0 – synthetic page on {host}"}}
    assert children[1].startswith("FetchMiss")
    assert children[2].startswith("RuleNotFoundError")


def test_crawl_adaptive_paths_agree(spark, corpus, tmp_path):
    """The adaptive strategy switches (bloom seen-filter engaged,
    shuffle fetch forced instead of broadcast) must not change any
    output: records, seen set, and final results are identical."""
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]

    variants = {
        "default": {},
        "bloom": {"bloom_min_seen": 0},
        "shuffle_fetch": {"broadcast_fetch_max": 0},
    }
    outputs = {}
    for name, kwargs in variants.items():
        eng = CrawlEngine(
            spark,
            pages,
            storage_json,
            tmp_path / f"state_{name}",
            state_partitions=4,
            **kwargs,
        )
        eng.seed(seeds)
        eng.run(max_rounds=10)
        recs = {
            (r["url"], r["rule_name"], r["result"], r["error"])
            for r in eng.records().collect()
        }
        seen = {r["url_canon"] for r in eng.seen().collect()}
        outputs[name] = (recs, seen, eng.assemble_results(seeds))

    base = outputs["default"]
    for name in ("bloom", "shuffle_fetch"):
        assert outputs[name] == base, f"{name} diverged from default"


def test_expire_and_requeue_recrawls(spark, corpus, tmp_path):
    """TTL recrawl: expiring the whole seen set requeues every URL and a
    second crawl pass reproduces the same extraction records."""
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]
    eng = CrawlEngine(spark, pages, storage_json, tmp_path / "state_ttl", state_partitions=4)
    eng.seed(seeds)
    eng.run(max_rounds=10)
    first_pass = {
        (r["url"], r["rule_name"], r["result"]) for r in eng.records().collect()
    }
    n_seen = eng.seen().count()

    stats = eng.expire_and_requeue(max_age_rounds=0)  # everything expires
    assert stats["seen_kept"] == 0
    assert stats["n_pending"] == n_seen
    assert not eng.read_manifest()["done"]

    rounds2 = eng.run(max_rounds=10)
    recrawl_round = stats["round"] + 1
    second_pass = {
        (r["url"], r["rule_name"], r["result"])
        for r in eng.records().collect()
        if r["round"] >= recrawl_round
    }
    assert {u for u, _, _ in second_pass} == {u for u, _, _ in first_pass}
    assert second_pass == first_pass  # byte-identical re-extraction
    assert eng.seen().count() == n_seen


def test_crawl_with_pluggable_adapter(spark, corpus, tmp_path):
    """The Adapter seam: a dict-backed FakeAdapter (with retry wrapper)
    must reproduce the join-based engine's crawl exactly — same nested
    results, same seen set."""
    from uniparser_spark.adapters import FakeAdapter, RetryingAdapter

    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]

    class FlakyOnce(FakeAdapter):
        # first ask for each URL fails; RetryingAdapter must recover
        def __init__(self, bodies):
            super().__init__(bodies)
            self.asked = set()

        def fetch_batch(self, requests):
            results = super().fetch_batch(requests)
            for i, req in enumerate(requests):
                if req["url"] not in self.asked:
                    self.asked.add(req["url"])
                    r = results[i]
                    results[i] = type(r)(r.url, None, 599, "FlakyError")
            return results

    adapter = RetryingAdapter(FlakyOnce(store), retries=2)
    engine = CrawlEngine(
        spark, None, storage_json, tmp_path / "state_adapter",
        adapter=adapter, state_partitions=2,
    )
    engine.seed(seeds)
    engine.run(max_rounds=10)
    got = engine.assemble_results(seeds)

    ref = CrawlEngine(spark, pages, storage_json, tmp_path / "state_join", state_partitions=2)
    ref.seed(seeds)
    ref.run(max_rounds=10)
    assert got == ref.assemble_results(seeds)
    assert (
        {r["url_canon"] for r in engine.seen().collect()}
        == {r["url_canon"] for r in ref.seen().collect()}
    )


def test_seen_deltas_are_append_only_and_compact(spark, corpus, tmp_path):
    """Seen state is an append-only delta log: seen/r{k+1} holds exactly
    round k's scheduled URLs (O(round) I/O, never O(total)), and TTL
    maintenance compacts the log and advances seen_base."""
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]
    eng = CrawlEngine(spark, pages, storage_json, tmp_path / "state_delta", state_partitions=2)
    eng.seed(seeds)
    rounds = eng.run(max_rounds=10)

    # delta r1 = round 0's scheduled set (the seeds), delta r2 = round 1's
    d1 = spark.read.parquet(str(tmp_path / "state_delta/seen/r1"))
    assert {r["url_canon"] for r in d1.collect()} == {canonicalize_url(u) for u in seeds}
    assert d1.select("crawled_round").distinct().collect()[0][0] == 0
    d2 = spark.read.parquet(str(tmp_path / "state_delta/seen/r2"))
    assert d2.count() == rounds[1]["scheduled"]
    total = eng.seen().count()
    assert total == d1.count() + d2.count()  # union of disjoint deltas

    # maintenance compacts: seen_base advances, membership unchanged
    # (max_age large → nothing expires)
    eng.expire_and_requeue(max_age_rounds=100)
    m = eng.read_manifest()
    assert m["seen_base"] == m["round"]
    assert eng.seen().count() == total


def test_seen_inline_autocompaction(spark, corpus, tmp_path):
    """With seen_compact_every=2 the second productive round folds the
    whole log into its delta and advances seen_base — deep crawls never
    read an unbounded union of deltas."""
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]
    eng = CrawlEngine(
        spark, pages, storage_json, tmp_path / "state_autocompact",
        state_partitions=2, seen_compact_every=2,
    )
    eng.seed(seeds)
    rounds = eng.run(max_rounds=10)
    m = eng.read_manifest()
    assert m["seen_base"] == 2
    d2 = spark.read.parquet(str(tmp_path / "state_autocompact/seen/r2"))
    assert d2.count() == sum(s.get("scheduled", 0) for s in rounds)  # full log
    assert eng.seen().count() == d2.count()
    # parity with the un-compacted engine
    ref = CrawlEngine(spark, pages, storage_json, tmp_path / "state_nocompact", state_partitions=2)
    ref.seed(seeds)
    ref.run(max_rounds=10)
    assert (
        {r["url_canon"] for r in eng.seen().collect()}
        == {r["url_canon"] for r in ref.seen().collect()}
    )


def test_seen_log_long_horizon_soak(spark, tmp_path):
    """100+-round soak over a micro-corpus: TTL recrawl cycles drive the
    append-only seen-delta log through many inline compactions and a
    maintenance compaction per cycle; a mid-soak engine restart lands
    exactly ON an inline-compaction round.  Invariants checked every
    cycle: seen membership == the full site (no false negatives after
    compaction), unique url_hash (no duplicate seen entries), manifest
    round strictly monotone, seen_base <= round and only advancing, and
    manifest seen_total == the materialized seen count."""
    from pathlib import Path

    pages = testgen.generate_pages(spark, n_hosts=2, n_details=6).cache()
    storage_json = testgen.storage_json(2)
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(2)]
    state = tmp_path / "state_soak"

    def new_engine():
        return CrawlEngine(
            spark, pages, storage_json, state,
            state_partitions=2, seen_compact_every=5,
        )

    eng = new_engine()
    eng.seed(seeds)
    eng.run(max_rounds=10)
    site = {r["url_canon"] for r in eng.seen().collect()}
    # 2 list pages + the zipf split of 6 details across 2 hosts
    assert len(site) == 2 + sum(testgen.zipf_counts(2, 6))
    last_round = eng.read_manifest()["round"]
    last_base = int(eng.read_manifest().get("seen_base", 0) or 0)
    restarted = compactions_seen = 0

    for cycle in range(50):
        # expire everything crawled >1 cycle ago -> full recrawl demand
        eng.expire_and_requeue(max_age_rounds=2)
        m = eng.read_manifest()
        assert m["round"] == last_round + 1
        assert int(m["seen_base"]) == m["round"]  # maintenance compacts

        if not restarted and m["round"] >= 30:
            # restart the engine so the resumed round IS an inline-
            # compaction round (compact_every=1 forces the fold)
            eng = new_engine()
            eng.seen_compact_every = 1
            stats = eng.run_round()
            m2 = eng.read_manifest()
            if stats["scheduled"]:
                assert int(m2["seen_base"]) == m2["round"]  # compacted
            eng = new_engine()
            restarted = 1

        eng.run(max_rounds=10)
        m = eng.read_manifest()
        # membership invariant: after a full recrawl cycle the live seen
        # set is exactly the site again
        rows = eng.seen().collect()
        assert {r["url_canon"] for r in rows} == site
        hashes = [r["url_hash"] for r in rows]
        assert len(hashes) == len(set(hashes))
        assert int(m.get("seen_total", -1)) == len(rows)
        assert m["round"] > last_round
        base = int(m.get("seen_base", 0) or 0)
        assert last_base <= m["round"] + 1 and base >= 0
        if base > last_base:
            compactions_seen += 1
        last_round, last_base = m["round"], base
        # every delta inside [seen_base, round] exists on disk
        for r in range(base, last_round + 1):
            assert Path(eng._p("seen", r)).exists() or r == last_round

    assert restarted and compactions_seen >= 10
    assert last_round >= 100  # the soak really covered 100+ rounds


def test_expire_and_requeue_freshness_ranked(spark, corpus, tmp_path):
    """With a fetch-history table, requeued URLs carry freshness-model
    priorities in [-1, 0): frequently-changing pages outrank static
    ones, and all recrawls still rank below fresh finds (>= 0)."""
    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]
    eng = CrawlEngine(
        spark, pages, storage_json, tmp_path / "state_fresh", state_partitions=4
    )
    eng.seed(seeds)
    eng.run(max_rounds=10)
    seen_urls = [r["url_canon"] for r in eng.seen().collect()]
    hot, others = seen_urls[0], seen_urls[1:]
    history = spark.createDataFrame(
        [(hot, 6, 5)] + [(u, 6, 0) for u in others],
        "url_canon string, fetch_count long, change_count long",
    )

    eng.expire_and_requeue(max_age_rounds=0, history=history)
    rnd = eng.read_manifest()["round"]
    frontier = spark.read.parquet(
        str(tmp_path / "state_fresh" / "frontier" / f"r{rnd}")
    )
    prio = {r["url_canon"]: r["priority"] for r in frontier.collect()}
    assert all(-1.0 <= p < 0.0 for p in prio.values())
    # the hot page outranks every static one
    assert prio[hot] == max(prio.values())
    assert all(prio[hot] > prio[u] for u in others)


def test_seed_df_from_sitemap_entries(spark, corpus, tmp_path):
    """Distributed seeding: sitemap XML -> entry table -> seeds_from_
    entries -> CrawlEngine.seed_df.  The crawl result matches a
    list-seeded run, and round-0 frontier carries the advertised
    priorities with canonical-collision dedup (max priority, min url)."""
    from uniparser_spark.sources.sitemap import (
        build_sitemap,
        seeds_from_entries,
        sitemap_entries,
    )

    pages, storage_json, store = corpus
    seeds = [testgen.list_url(testgen.host_name(i)) for i in range(3)]
    sm = build_sitemap(
        [{"loc": seeds[0], "priority": 0.9},
         {"loc": seeds[0].replace("https://", "HTTPS://"), "priority": 0.4},
         {"loc": seeds[1], "priority": 0.7},
         {"loc": seeds[2]}]  # default 0.5
    )
    sm_pages = spark.createDataFrame(
        [("https://seeds.example.org/sitemap.xml", bytearray(sm))],
        "url string, html binary",
    )
    seed_tbl = seeds_from_entries(sitemap_entries(sm_pages))

    eng = CrawlEngine(spark, pages, storage_json, tmp_path / "state_smseed",
                      state_partitions=4)
    eng.seed_df(seed_tbl)
    frontier = spark.read.parquet(str(tmp_path / "state_smseed" / "frontier" / "r0"))
    rows = {r["url_canon"]: r for r in frontier.collect()}
    # the HTTPS:// variant canonicalizes onto seeds[0]: max priority won,
    # one frontier row fetching the canonical form
    assert len(rows) == 3
    s0 = rows[canonicalize_url(seeds[0])]
    assert s0["priority"] == 0.9 and s0["url"] == canonicalize_url(seeds[0])
    assert rows[canonicalize_url(seeds[1])]["priority"] == 0.7
    assert rows[canonicalize_url(seeds[2])]["priority"] == 0.5

    rounds = eng.run(max_rounds=10)
    assert rounds[-1]["done"] or rounds[-1]["scheduled"] == 0
    got = eng.assemble_results(seeds)
    # same extraction results as a plain list-seeded crawl
    ref = CrawlEngine(spark, pages, storage_json, tmp_path / "state_listseed",
                      state_partitions=4)
    ref.seed(seeds)
    ref.run(max_rounds=10)
    assert got == ref.assemble_results(seeds)
    assert {r["url_canon"] for r in eng.seen().collect()} == {
        r["url_canon"] for r in ref.seen().collect()
    }


def test_crawl_dust_rules_collapse_aliases_prefetch(spark, tmp_path):
    """Engine-integrated DUST: discovered children carrying a ruled-out
    query param are rewritten BEFORE canonicalization, so aliases
    collapse onto the canonical (one fetch, no FetchMiss) and the
    unruled param survives untouched."""
    import uniparser_spark.config as cfg

    pages = testgen.generate_pages(spark, n_hosts=1, n_details=3)
    storage = testgen.build_storage(1, keep_first=3)
    host = testgen.host_name(0)
    # children: the same detail page under utm-tracked aliases + one
    # page whose param is NOT ruled out (stays a distinct URL -> miss)
    storage[host]["crawler_rules"]["list"]["parse_rules"][0]["chain_rules"] = [
        ["udf",
         f"['https://{host}/item-000000/?utm=a', "
         f"'https://{host}/item-000000/?utm=b&m=1', "
         f"'https://{host}/item-000001/?keep=1']",
         ""]
    ]
    rules = spark.createDataFrame(
        [(host, "utm", 5), (host, "m", 5)], "host string, param string, votes long"
    )
    eng = CrawlEngine(
        spark, pages, cfg.json_dumps(storage), tmp_path / "state_dust",
        state_partitions=2, dust_rules=rules,
    )
    eng.seed([testgen.list_url(host)])
    eng.run(max_rounds=5)
    [result] = eng.assemble_results([testgen.list_url(host)])
    children = result["list"]["__result__"]
    # both aliases collapsed onto the canonical item-000000 -> extracted
    assert children[0] == {"detail": {"title": f"Item 0 – synthetic page on {host}"}}
    assert children[1] == {"detail": {"title": f"Item 0 – synthetic page on {host}"}}
    # keep=1 was not ruled out: the URL stays distinct (and here fails
    # rule dispatch, since the detail regex doesn't admit a query)
    assert children[2].startswith("RuleNotFoundError")
    assert "keep=1" in children[2]
    # the seen set holds ONE canonical entry for item-000000 (no aliases)
    seen = {r["url_canon"] for r in eng.seen().collect()}
    assert f"https://{host}/item-000000/" in seen
    assert not any("utm=" in u for u in seen)


def test_crawl_honor_nofollow_drops_children(spark, corpus, tmp_path):
    """REP HTML extension in the loop: children of a nofollow page are
    never scheduled; everything else crawls identically."""
    from pyspark.sql import functions as F

    pages, storage_json, store = corpus
    h0, h1 = testgen.host_name(0), testgen.host_name(1)
    seeds = [testgen.list_url(h0), testgen.list_url(h1)]
    tagged = pages.withColumn(
        "text",
        F.when(
            F.col("url") == testgen.list_url(h1),
            F.concat(F.lit('<meta name="robots" content="nofollow">'), F.col("text")),
        ).otherwise(F.col("text")),
    )

    eng = CrawlEngine(
        spark, tagged, storage_json, tmp_path / "state_nf",
        state_partitions=4, honor_nofollow=True,
    )
    eng.seed(seeds)
    eng.run(max_rounds=6)
    crawled = {r["url"] for r in eng.records().collect()}
    # h1's list page itself is crawled (and its records kept for audit)...
    assert testgen.list_url(h1) in crawled
    # ...but none of its detail children were scheduled
    assert not any(u.startswith(f"https://{h1}/item-") for u in crawled)
    # h0 crawls normally
    assert any(u.startswith(f"https://{h0}/item-") for u in crawled)

    # control: same corpus without the flag follows h1's links
    eng2 = CrawlEngine(
        spark, tagged, storage_json, tmp_path / "state_nf_off",
        state_partitions=4,
    )
    eng2.seed(seeds)
    eng2.run(max_rounds=6)
    crawled2 = {r["url"] for r in eng2.records().collect()}
    assert any(u.startswith(f"https://{h1}/item-") for u in crawled2)


def test_crawl_blocklist_keeps_domain_out_of_frontier(spark, corpus, tmp_path):
    """Discovered candidates on a blocklisted domain never enter the
    frontier; seeds bypass the list (curated by contract)."""
    pages, storage_json, store = corpus
    h0, h1 = testgen.host_name(0), testgen.host_name(1)
    seeds = [testgen.list_url(h0), testgen.list_url(h1)]
    rules = spark.createDataFrame([(h1,)], "domain string")

    eng = CrawlEngine(
        spark, pages, storage_json, tmp_path / "state_bl",
        state_partitions=4, blocklist=rules,
    )
    eng.seed(seeds)
    eng.run(max_rounds=6)
    crawled = {r["url"] for r in eng.records().collect()}
    assert testgen.list_url(h1) in crawled  # seed bypass
    assert not any(u.startswith(f"https://{h1}/item-") for u in crawled)
    assert any(u.startswith(f"https://{h0}/item-") for u in crawled)


# ------------------------------------------------------- sessionization
def test_sessionize_gaps_and_ties(spark):
    """Gap sessionization: 30-min cut, tie-broken ordering, 1-based ids."""
    import datetime as dt

    from uniparser_spark.crawl.sessions import sessionize

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # host 1: two sessions — 3 events, then a 1h gap, then 1 event
        (1, s(0), 10),
        (1, s(60), 11),
        (1, s(1800), 12),      # exactly gap_sec since prev -> SAME session
        (1, s(1800 + 3601), 13),
        # host 2: simultaneous events tie-break on id; then new session
        (2, s(0), 20),
        (2, s(0), 21),
        (2, s(2000), 22),
    ]
    df = spark.createDataFrame(
        [(u, ts, e) for (u, ts, e) in rows], "user_id long, ts timestamp, event_id long"
    )
    out = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize(df, gap_sec=1800).collect()
    }
    assert set(out) == {(1, 1), (1, 2), (2, 1), (2, 2)}
    a = out[(1, 1)]
    assert a["n_events"] == 3 and a["first_event"] == 10
    assert a["duration_sec"] == 1800
    b = out[(1, 2)]
    assert b["n_events"] == 1 and b["first_event"] == 13 and b["duration_sec"] == 0
    c = out[(2, 1)]
    assert c["n_events"] == 2 and c["first_event"] == 20
    assert out[(2, 2)]["first_event"] == 22


# ------------------------------------------------------------ classify_urls
def test_classify_urls_rule_per_class(spark):
    from uniparser_spark.crawl.classify import classify_urls

    cases = [
        # (url, page_type, priority, depth, has_query)
        ("https://s.ex/2026/08/my-post", "article", 1, 3, 0),
        ("https://s.ex/some-very-long-slug-here.html", "article", 1, 1, 0),
        ("https://s.ex/product/widget-9", "product", 2, 2, 0),
        ("https://s.ex/dp/B0123", "product", 2, 2, 0),
        ("https://s.ex/blog/page/12", "pagination", 5, 3, 0),
        ("https://s.ex/list?page=3", "pagination", 5, 1, 1),
        ("https://s.ex/search/books", "search", 8, 2, 0),
        ("https://s.ex/find?q=x", "search", 8, 1, 1),
        ("https://s.ex/logo.svg", "asset", 9, 1, 0),
        ("https://s.ex/feed", "feed", 4, 1, 0),
        ("https://s.ex/news/", "section", 3, 1, 0),
        ("https://s.ex/news/tech", "section", 3, 2, 0),
        ("https://s.ex/a/b/c/d", "other", 6, 4, 0),
        ("https://s.ex/", "other", 6, 0, 0),
        # asset wins over everything (first match)
        ("https://s.ex/2026/08/chart.png", "asset", 9, 3, 0),
    ]
    df = spark.createDataFrame([(u,) for u, *_ in cases], "url string")
    got = {r["url"]: r.asDict() for r in classify_urls(df).collect()}
    for u, ptype, prio, depth, q in cases:
        r = got[u]
        assert (r["page_type"], r["type_priority"]) == (ptype, prio), u
        assert (r["path_depth"], r["has_query"]) == (depth, q), u


def test_failure_episodes_islands_and_recovery(spark):
    """Outage detection: maximal failure runs, min_failures gate,
    recovered flag off when a host's log ends mid-outage."""
    import datetime as dt

    from uniparser_spark.crawl.sessions import failure_episodes

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    s = lambda sec: t0 + dt.timedelta(seconds=sec)
    rows = [
        # host a: ok, FAIL FAIL FAIL, ok, FAIL (singleton -> gated out)
        ("a", s(0), 1, 1),
        ("a", s(10), 2, 0),
        ("a", s(20), 3, 0),
        ("a", s(30), 4, 0),
        ("a", s(40), 5, 1),
        ("a", s(50), 6, 0),
        # host b: ends dark — FAIL FAIL at the tail, never recovers
        ("b", s(0), 7, 1),
        ("b", s(10), 8, 0),
        ("b", s(20), 9, 0),
        # host c: all ok — no episodes
        ("c", s(0), 10, 1),
    ]
    df = spark.createDataFrame(
        rows, "host string, ts timestamp, event_id long, ok int"
    )
    out = [
        r.asDict()
        for r in failure_episodes(df, min_failures=2)
        .orderBy("host", "start_us")
        .collect()
    ]
    assert len(out) == 2
    a, b = out
    assert a["host"] == "a" and a["n_failures"] == 3
    assert a["first_event"] == 2 and a["recovered"] == 1
    assert (a["end_us"] - a["start_us"]) == 20_000_000
    assert b["host"] == "b" and b["n_failures"] == 2 and b["recovered"] == 0
