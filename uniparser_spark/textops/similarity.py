"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  The query side is tiny and **broadcast**, so the plan is a broadcast
  nested-loop join + per-query window; the corpus is never shuffled.
- ``rhp_lsh_topk``: the scale path — deterministic random-hyperplane
  LSH. Each vector gets an n_planes-bit bucket from the signs of dot
  products against md5-derived ±1 hyperplanes; candidates share a
  bucket, then exact cosine reranks. Bucket keys are uniform → skew-free
  shuffle; at 100 TB the corpus-side signature scan is narrow (id +
  bucket) and the exact rerank touches only same-bucket candidates.
- ``embedding_dup_pairs``: near-duplicate detection by cosine ≥ τ.

All arithmetic is double-precision with sequential fold order so DuckDB
reproduces values exactly (see .exprs.dot); similarities are rounded to
6 dp before emission and ranking, making top-k ties deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .exprs import cosine


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def cosine_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k: for each query vector (id <
    n_queries) the k nearest corpus vectors (self excluded).

    Returns (qid, vec_id, sim) with sim rounded to 6 dp; ordering ties
    broken by vec_id so results are deterministic.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv")
    )
    sims = (
        base.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col(id_col))
    return (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "sim")
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    max_id: int = 300,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id1 < id2, sim ≥ threshold) over
    the capped id range — the quadratic verifier; feed LSH candidates at
    scale."""
    base = emb.filter(F.col(id_col) < max_id).select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    a = base.select(F.col(id_col).alias("id1"), F.col("v").alias("v1"))
    b = base.select(F.col(id_col).alias("id2"), F.col("v").alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select(
            "id1",
            "id2",
            F.round(cosine(F.col("v1"), F.col("v2")), 6).alias("sim"),
        )
        .filter(F.col("sim") >= threshold)
    )


def _plane_coef(p: Column, d: Column) -> Column:
    """Deterministic ±1 hyperplane coefficient from md5('p:d') parity."""
    key = F.concat(p.cast("string"), F.lit(":"), d.cast("string"))
    return ((F.ascii(F.substring(F.md5(key), 1, 1)) % 2) * 2 - 1).cast("double")


def rhp_bucket(v: Column, n_planes: int, dims: int) -> Column:
    """Random-hyperplane LSH bucket: bit p = sign(v · plane_p)."""
    def plane_dot(p: Column) -> Column:
        return F.aggregate(
            F.sequence(F.lit(1), F.lit(dims)),
            F.lit(0.0),
            lambda acc, d: acc + F.element_at(v, d) * _plane_coef(p, d),
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(n_planes)),
        F.lit(0).cast("long"),
        lambda acc, p: acc
        + F.when(plane_dot(p) >= 0, F.pow(F.lit(2.0), p - 1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


def rhp_lsh_topk(
    emb: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = 6,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: LSH-bucket candidate generation + exact
    cosine rerank within the query's bucket.

    Recall < 1 by construction (ANN); the candidate join is an
    equi-join on the bucket key instead of a full cross join, which is
    what makes this the 100 TB path.
    """
    base = emb.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v")).withColumn(
        "bucket", rhp_bucket(F.col("v"), n_planes, dims)
    )
    q = base.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("qid"), F.col("v").alias("qv"), F.col("bucket")
    )
    cands = (
        base.join(F.broadcast(q), "bucket")
        .where(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col),
            F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.col(id_col))
    return (
        cands.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("qid", id_col, "sim")
    )
