"""Plan-shape invariance: Exchange counts must not depend on data size.

The 100 TB claim rests on the physical plan STRUCTURE being fixed as
data grows — AQE may flip join strategies inside an Exchange, but a
scale-dependent shuffle count means the plan itself is data-sized and
will not survive a 1000× scale-up.  BENCH_SCALE10 measured this
property at 10× sf0.1 for the hot families; this test pins it as a
regression check at test scale: for each representative query the
initial executed plan's Exchange count at sf0.001 must equal the count
at sf0.01 (10× the rows).  Planning only — nothing executes.
"""

import os

import pytest

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"

# one representative per hot family (dedup, spans, CC, PageRank,
# containment, discovery, cleaning, DUST, links, retrieval)
REPRESENTATIVES = [
    "minhash_lsh_pairs",
    "dup_spans",
    "dedup_clusters",
    "pagerank3",
    "containment_pairs",
    "discovery_merge",
    "para_dedup",
    "url_aliases",
    "anchor_index",
    "bm25_index",
]


def _exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


@pytest.mark.skipif(
    not (os.path.isdir(SF_A) and os.path.isdir(SF_B)),
    reason="testdata missing",
)
@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_exchange_count_is_scale_invariant(spark, name):
    from uniparser_spark.suite import QUERIES

    a = _exchanges(QUERIES[name](spark, SF_A))
    b = _exchanges(QUERIES[name](spark, SF_B))
    assert a == b, (
        f"{name}: Exchange count changed with data size ({a} at sf0.001 vs "
        f"{b} at sf0.01) — the plan shape is data-sized and will not hold "
        f"at corpus scale"
    )
