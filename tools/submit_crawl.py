#!/usr/bin/env python3
"""spark-submit entry point for the distributed crawl.

Cluster deployment (the north-rule execution mode):

    python -c "from uniparser_spark.engine.session import ship_package" # or:
    zip -r uniparser_spark.zip uniparser_spark
    spark-submit --py-files uniparser_spark.zip tools/submit_crawl.py \
        --pages  s3://bucket/cc-pages/        \
        --rules  host_rules.json              \
        --state  s3://bucket/crawl-state/     \
        --seeds  seeds.txt                    \
        --rounds 50 --budget 10000 --robots

Locally it self-ships the package, so plain `python tools/submit_crawl.py`
also works.  Seeds default to every CrawlerRule's request_args URL when
--seeds is omitted.  Resume is automatic: if the state dir has a
manifest, seeding is skipped and rounds continue from the checkpoint.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pages", required=True, help="parquet dir: (url, warc_ts, html, text, lang)")
    ap.add_argument("--rules", required=True, help="JSONRuleStorage file ({host: HostRule})")
    ap.add_argument("--state", required=True, help="crawl state dir (checkpointed)")
    ap.add_argument("--seeds", help="file with one seed URL per line (default: rule request URLs)")
    ap.add_argument("--rounds", type=int, default=100)
    ap.add_argument("--budget", type=int, default=100000, help="default per-host URLs per round")
    ap.add_argument("--robots", action="store_true", help="honor robots.txt found in the pages table")
    ap.add_argument(
        "--round-interval",
        type=float,
        default=0.0,
        help="minimum wall-clock seconds between round STARTS. This is "
        "what makes per-round politeness budgets real rates: with "
        "budgets = interval/crawl_delay (budgets_from_robots), a host "
        "is fetched at most budget URLs per interval — the engine's "
        "deterministic per-round budget becomes the reference's "
        "wall-clock Frequency (reference parsers.py:1508-1513). 0 = "
        "run rounds back-to-back (batch/backfill mode).",
    )
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html-col", default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from uniparser_spark import config
    from uniparser_spark.crawl.engine import CrawlEngine
    from uniparser_spark.engine.session import get_spark, ship_package
    from uniparser_spark.frontier.robots import budgets_from_robots, robots_table

    if SparkSession.getActiveSession() is not None:  # under spark-submit
        spark = SparkSession.getActiveSession()
        ship_package(spark)
    else:
        spark = get_spark(app_name="uniparser_spark_crawl")

    storage_json = Path(args.rules).read_text()
    pages = spark.read.parquet(args.pages)

    robots = budgets = None
    if args.robots:
        robots = robots_table(pages, text_col=args.text_col).cache()
        budgets = budgets_from_robots(
            robots,
            round_interval_sec=args.round_interval or 60.0,
            default_budget=args.budget,
        )

    eng = CrawlEngine(
        spark,
        pages,
        storage_json,
        args.state,
        budgets=budgets,
        robots=robots,
        default_budget=args.budget,
        text_col=args.text_col,
        html_col=args.html_col,
    )

    if eng.read_manifest()["round"] < 0:  # fresh state: seed
        if args.seeds:
            seeds = [u.strip() for u in Path(args.seeds).read_text().splitlines() if u.strip()]
        else:
            storage = config.json_loads(storage_json)
            seeds = [
                cr["request_args"]["url"]
                for host_rule in storage.values()
                if isinstance(host_rule, dict)
                for cr in host_rule.get("crawler_rules", {}).values()
            ]
        eng.seed(seeds)
        print(json.dumps({"seeded": len(seeds)}))

    # paced round loop: each round starts no earlier than
    # --round-interval after the previous round's start, so crawl-delay
    # budgets translate into true fetch rates
    for _ in range(args.rounds):
        t_start = time.monotonic()
        stats = eng.run_round()
        print(json.dumps(stats), flush=True)
        if stats.get("done") or stats.get("scheduled", 0) == 0:
            break
        wait = args.round_interval - (time.monotonic() - t_start)
        if wait > 0:
            time.sleep(wait)


if __name__ == "__main__":
    main()
