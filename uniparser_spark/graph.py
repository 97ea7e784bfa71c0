"""Link-graph analytics over the crawled corpus: degrees + PageRank.

A crawl pipeline's frontier wants link-derived priority signals — the
reference hardcodes FIFO order (crawler.py recursion); at web scale the
standard signal is in-link authority (PageRank) over the host/page
graph.  This module implements the iterative computation Spark-first:
edges and ranks are DataFrames, one iteration = join(edges, ranks) →
map-side-combined groupBy(dst) → left join back onto the node set.
Spark's scheduler pipelines the unrolled iterations into one lazy plan;
every shuffle carries narrow (id, double) rows, never page content.

A fixed iteration count keeps the whole computation SQL-expressible, so
the DuckDB oracle unrolls the identical three iterations and the driver
hash-checks every rank (constants are written so both engines compute
bit-identical doubles: `1 - 0.85` evaluates to the same IEEE value
everywhere; ranks are rounded only at emission).

The sf tables carry no hyperlinks, so the suite wrapper synthesizes a
deterministic circulant graph over doc_ids (v → (7v+k) mod n,
k=1..fanout, self-loops dropped) — the oracle re-synthesizes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def synth_edges(
    df: DataFrame, n_nodes: int, id_col: str = "doc_id", fanout: int = 3
) -> DataFrame:
    """Deterministic circulant link graph: v → (7v+k) mod n_nodes for
    k = 1..fanout, self-loops dropped (distinct targets for n > fanout)."""
    did = F.col(id_col)
    dsts = F.array(*[(did * 7 + k) % n_nodes for k in range(1, fanout + 1)])
    return (
        df.select(did.alias("src"), F.explode(dsts).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )


def link_degrees(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node out/in degree over the edge list (two narrow partial
    aggregations + left joins onto the node set; absent = 0)."""
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    return (
        nodes.join(out_deg, "node", "left")
        .join(in_deg, "node", "left")
        .select(
            "node",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    n_nodes: int,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank after ``iters`` synchronous iterations (uniform init,
    no dangling nodes in the synthesized graph — every v has out-links).

    Scale shape per iteration: contributions = edges ⋈ ranks on src
    (both sides narrow; a production run pre-partitions edges by src so
    the join reuses one Exchange across iterations), then a map-side
    combined sum by dst, then a left join onto the node set for the
    teleport term.  Rank state is O(nodes) narrow rows.
    """
    n = float(n_nodes)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    edges_deg = edges.join(deg, "src")
    ranks = nodes.select("node", (F.lit(1.0) / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iters):
        # explicit aliases: ranks' lineage includes edges_deg/nodes after
        # the first iteration, and unaliased self-joins are ambiguous
        contribs = (
            edges_deg.alias("e")
            .join(ranks.alias("r"), F.col("e.src") == F.col("r.node"))
            .select(
                F.col("e.dst").alias("dst"),
                (F.col("r.rank") / F.col("e.outdeg")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.alias("n")
            .join(contribs.alias("c"), F.col("n.node") == F.col("c.dst"), "left")
            .select(
                F.col("n.node").alias("node"),
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce(F.col("c.c"), F.lit(0.0))
                ).alias("rank"),
            )
        )
    return ranks.select("node", F.round("rank", 6).alias("rank"))
