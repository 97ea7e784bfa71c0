"""Scale-stress the hot query families beyond sf0.1.

Synthesizes a MULTx corpus (default 10x sf0.1: 50k documents / 20k
embeddings) under .scratch/sfX by unioning offset copies of the sf0.1
tables — doc_id/vec_id shifted per copy so modulo-derived hosts/links
keep their distribution, text suffixed per copy so near-dup families
see both exact cross-copy duplicates AND fresh shingles — then runs
each hot family at sf0.1 and at the synthetic scale on the same
session and reports:

  * wall seconds at both scales and the wall-growth ratio (want ~MULT
    or less — super-linear growth means a quadratic or a spill),
  * the physical plan's Exchange count at both scales (want IDENTICAL
    — a scale-dependent Exchange count means the plan shape itself is
    data-sized, which will not survive 100 TB).

Results print as one JSON line for BENCH/PLANS recording.  Usage:

    python tools/scale_stress.py [mult] [family ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"
FAMILIES = [
    # family -> suite query names to time (VERDICT r4 task 5 set)
    ("dedup", ["minhash_lsh_pairs", "dup_spans", "dedup_incremental"]),
    ("graph", ["dedup_clusters", "pagerank3", "link_degrees"]),
    ("containment", ["containment_pairs"]),
    ("discovery", ["discovery_merge"]),
    # round-5 extension: one representative per additional hot family
    ("cleaning", ["para_dedup", "c4_line_filter"]),
    ("dust", ["url_aliases"]),
    ("ann", ["embedding_clusters", "ivf_topk"]),
    ("index", ["bm25_index", "anchor_index"]),
]


def synth(mult: int) -> str:
    """Build the MULTx dir once; reuse if already present."""
    out = os.path.abspath(f".scratch/sf0.1x{mult}")
    stamp = os.path.join(out, ".complete")
    if os.path.exists(stamp):
        return out
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out, exist_ok=True)
    import duckdb

    con = duckdb.connect()
    n_doc = con.execute(
        f"SELECT max(doc_id) + 1 FROM '{BASE}/documents.parquet'"
    ).fetchone()[0]
    n_vec = con.execute(
        f"SELECT max(vec_id) + 1 FROM '{BASE}/embeddings.parquet'"
    ).fetchone()[0]
    copies = " UNION ALL ".join(
        f"SELECT doc_id + {i * n_doc} AS doc_id, "
        # copy 0 keeps text verbatim (exact cross-copy dup pressure is
        # supplied by copies 1..n sharing prefixes); each copy appends a
        # distinct suffix so shingle sets shift without collapsing
        + ("text" if i == 0 else f"text || ' copyvariant{i}'")
        + f" AS text, lang, source, n_chars FROM '{BASE}/documents.parquet'"
        for i in range(mult)
    )
    con.execute(f"COPY ({copies}) TO '{out}/documents.parquet' (FORMAT PARQUET)")
    vcopies = " UNION ALL ".join(
        f"SELECT vec_id + {i * n_vec} AS vec_id, embedding, label "
        f"FROM '{BASE}/embeddings.parquet'"
        for i in range(mult)
    )
    con.execute(f"COPY ({vcopies}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")
    for t in (
        "region nation customer supplier part orders lineitem events"
    ).split():
        shutil.copy(f"{BASE}/{t}.parquet", f"{out}/{t}.parquet")
    open(stamp, "w").close()
    return out


def exchange_count(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def run_once(qs, name, spark, sf_dir):
    df = qs[name](spark, sf_dir)
    ex = exchange_count(df)
    t0 = time.monotonic()
    n = df.count()
    return time.monotonic() - t0, ex, n


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    big = synth(mult)
    import __spark_entry__ as entrymod
    from uniparser_spark.engine.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    report = {"mult": mult, "base": BASE, "big": big, "families": {}}
    for family, names in FAMILIES:
        if only and family not in only:
            continue
        rows = {}
        for name in names:
            if name not in qs:
                continue
            # warm the JVM/IO path once at base scale, then measure
            run_once(qs, name, spark, BASE)
            w0, ex0, n0 = run_once(qs, name, spark, BASE)
            w1, ex1, n1 = run_once(qs, name, spark, big)
            rows[name] = {
                "wall_base_sec": round(w0, 2),
                "wall_big_sec": round(w1, 2),
                "wall_ratio": round(w1 / max(w0, 1e-9), 2),
                "exchanges_base": ex0,
                "exchanges_big": ex1,
                "exchange_stable": ex0 == ex1,
                "rows_base": n0,
                "rows_big": n1,
            }
            print(f"{family}/{name}: {rows[name]}", file=sys.stderr)
        report["families"][family] = rows
    print(json.dumps(report))
    bad = [
        f"{fam}/{q}"
        for fam, rs in report["families"].items()
        for q, r in rs.items()
        if not r["exchange_stable"]
    ]
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
