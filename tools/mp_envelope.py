"""Bare-multiprocessing scaling envelope of this box.

Parses the SAME ~20 KB synthetic detail pages with the pure-Python rule
engine in a multiprocessing.Pool at two worker counts and reports
(rate_hi / rate_lo) / (hi/lo) — the ceiling ANY Python-parse workload
(Spark included) can reach between those parallelism levels on this
machine.  No Spark involved: this isolates memory-bandwidth +
core-oversubscription effects from engine overhead.

Usage: python tools/mp_envelope.py [lo] [hi] [n_pages] [--pin]

--pin sets the process CPU affinity to exactly `workers` cores before
each Pool (children inherit it): the cpuset-pinned protocol, where the
lo level cannot borrow the box's idle cores for its own IPC/GC — the
fairest single-box stand-in for per-executor cores on a real cluster.
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _parse_batch(args):
    import json as _json

    from uniparser_spark.rules import CrawlerRule
    from uniparser_spark.chains import run_crawler_rule

    rule_json, pages = args
    rule = CrawlerRule(**_json.loads(rule_json))
    out = 0
    for url, html in pages:
        r = run_crawler_rule(html, rule, context={"url": url})
        out += len(str(r))
    return out


def measure(workers: int, batches, rule_json: str) -> float:
    with mp.Pool(workers) as pool:
        t0 = time.monotonic()
        pool.map(_parse_batch, [(rule_json, b) for b in batches])
        wall = time.monotonic() - t0
    return wall


def main() -> None:
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6000

    import json as _json

    from uniparser_spark import testgen

    host = testgen.host_name(0)
    storage = testgen.build_storage(1)
    rule_json = _json.dumps(storage[host]["crawler_rules"]["detail"])
    pages = [
        (testgen.detail_url(host, k), testgen.detail_html(host, k)) for k in range(n)
    ]
    per_batch = 50
    batches = [pages[i : i + per_batch] for i in range(0, n, per_batch)]

    pin = "--pin" in sys.argv

    def _affinity(workers: int) -> None:
        if pin:
            import os

            os.sched_setaffinity(0, set(range(workers)))

    _affinity(lo)
    measure(lo, batches[: len(batches) // 4], rule_json)  # warmup
    walls = {}
    for w in (lo, hi):
        _affinity(w)
        walls[w] = min(measure(w, batches, rule_json) for _ in range(2))
    r_lo, r_hi = n / walls[lo], n / walls[hi]
    print(
        json.dumps(
            {
                "lo_workers": lo,
                "hi_workers": hi,
                "pages": n,
                "pages_per_sec_lo": round(r_lo, 1),
                "pages_per_sec_hi": round(r_hi, 1),
                "envelope_efficiency": round((r_hi / r_lo) / (hi / lo), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
