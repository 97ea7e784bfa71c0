"""Two-parallelism-level scaling evidence for the north rule.

Runs the identical crawl job (same synthetic input, fresh JVM each) at
local[N] and local[4N], computes scaling efficiency
(throughput_4N / throughput_N) / 4, and rewrites the results section of
BENCH.md.  A real multi-executor cluster is out of reach in this
sandbox; two JVM parallelism levels on the same input are the
stand-in the driver accepts.

Usage: python tools/scaling_bench.py [N] [pages]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path


def run(cpus: int, pages: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_CRAWL_PAGES"] = str(pages)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--crawl-only"],
        capture_output=True,
        text=True,
        env=env,
        cwd=Path(__file__).resolve().parent.parent,
        check=True,
    )
    line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 60000
    lo = run(n, pages)
    hi = run(4 * n, pages)
    r_lo = lo["crawl"]["urls_per_sec"]
    r_hi = hi["crawl"]["urls_per_sec"]
    eff = round((r_hi / r_lo) / 4, 3)
    summary = {
        "n_cpus": n,
        "n4_cpus": 4 * n,
        "pages": pages,
        "urls_per_sec_n": r_lo,
        "urls_per_sec_4n": r_hi,
        "scaling_efficiency": eff,
        "crawl_n": lo["crawl"],
        "crawl_4n": hi["crawl"],
    }
    print(json.dumps(summary))
    Path("BENCH_SCALING.json").write_text(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
