"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the point of running these on Spark):

- exact dedup is one hash-groupBy — partial aggregation map-side, one
  shuffle on the 16-byte fingerprint, never on the document text;
- MinHash signatures are computed per-row with array lambdas (no
  shuffle, no Python); LSH banding explodes to ``bands`` rows per doc
  and joins docs on (band_idx, band_key) — the shuffle key is a 32-byte
  hash, uniformly distributed, so no skew; candidate pair volume is
  controlled by (n_hashes, bands) exactly as in the MinHash-LSH
  literature;
- SimHash packs a 16-bit signature per doc; grouping on it is a
  trivially small shuffle;
- n-gram Jaccard is the quadratic verifier — only ever run it on LSH
  candidates (or a capped id range in tests/oracles).

Hashing is the portable md5 family from .exprs so the DuckDB oracle
reproduces every value bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .exprs import h16, md5_bit, seeded_h16, tokens, word_shingles


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups by normalized content hash.

    Returns one row per distinct content: (content_fp, n_docs, keep_id)
    where keep_id is the smallest doc id (keep-first policy).
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return (
        df.select(F.col(id_col), h16(norm).alias("content_fp"))
        .groupBy("content_fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    shingle_k: int = 3,
    impl: str = "pandas",
) -> DataFrame:
    """Per-doc MinHash signature: array of n_hashes 16-hex-char minima
    over word shingle hashes.  Narrow transformation, no shuffle.

    impl='pandas' (default): Arrow-batched pandas UDF with hashlib.md5 —
    byte-identical to the SQL md5 the DuckDB oracle uses, and ~20× faster
    than the expression path because Spark's higher-order array lambdas
    are interpreted (no codegen), costing ~20µs per element.
    impl='expr': the pure-expression variant (kept as the reference
    semantics; also what a native xxhash64 production variant would
    replace md5 in).
    """
    if impl == "expr":
        sh = word_shingles(tokens(F.col(text_col)), shingle_k)
        sig = F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda s: F.array_min(F.transform(sh, lambda g: seeded_h16(s, g))),
        )
        return df.select(
            F.col(id_col), sig.alias("sig"), F.size(sh).alias("n_shingles")
        ).filter(F.col("n_shingles") > 0)

    import hashlib
    import re as _re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("sig", ArrayType(StringType()), False),
            StructField("n_shingles", IntegerType(), False),
        ]
    )
    ws = _re.compile(r"\s+")
    prefixes = [f"{s}:".encode() for s in range(n_hashes)]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for batch in batches:
            ids, sigs, counts = [], [], []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                toks = ws.split(text.strip()) if text and text.strip() else []
                n_sh = len(toks) - shingle_k + 1
                if n_sh <= 0:
                    continue
                grams = [
                    " ".join(toks[i : i + shingle_k]).encode() for i in range(n_sh)
                ]
                sig = [
                    min(md5(p + g).hexdigest()[:16] for g in grams)
                    for p in prefixes
                ]
                ids.append(int(doc_id))
                sigs.append(sig)
                counts.append(n_sh)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "sig": sigs,
                 "n_shingles": pd.Series(counts, dtype="int32")}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def lsh_candidate_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup candidate pairs (id1 < id2, distinct).

    bands × rows = n_hashes; a pair is a candidate iff all `rows`
    signature entries of some band agree (band key = md5 of the band
    slice).  The join key is (band_idx, band_key) — high-entropy, no
    skew; the doc text never crosses the shuffle.
    """
    assert n_hashes % bands == 0
    rows = n_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, n_hashes, shingle_k)
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda j: F.md5(F.concat_ws(",", F.slice(F.col("sig"), j * rows + 1, rows))),
    )
    # Materialize before the self-join: without a barrier the signature
    # UDF would run on BOTH join branches.  localCheckpoint (lazy) keeps
    # one computed copy for the two scans and — unlike cache() — is
    # released when this DataFrame is garbage collected, so repeated
    # invocations in a long session don't accrete storage (the r1 leak).
    # At cluster scale this is the point where signatures get written to
    # a table.
    banded = sigs.select(
        F.col(id_col), F.posexplode(band_keys).alias("band_idx", "band_key")
    ).localCheckpoint(eager=False)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band_idx", "band_key"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"),
            F.col(f"b.{id_col}").alias("id2"),
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    threshold: float = 0.5,
    max_id: int = 200,
) -> DataFrame:
    """Exact n-gram Jaccard similarity over all pairs with id < max_id
    (the quadratic verifier — cap the id range or feed LSH candidates).

    jaccard = |A∩B| / (|A|+|B|-|A∩B|) over distinct word shingles,
    rounded to 4 dp.
    """
    sh = F.array_distinct(word_shingles(tokens(F.col(text_col)), shingle_k))
    docs = (
        df.filter(F.col(id_col) < max_id)
        .select(F.col(id_col), sh.alias("sh"))
        .filter(F.size("sh") > 0)
    )
    a = docs.select(F.col(id_col).alias("id1"), F.col("sh").alias("sh1"))
    b = docs.select(F.col(id_col).alias("id2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = F.size("sh1").cast("double") + F.size("sh2").cast("double") - inter
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def verified_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = 16,
    bands: int = 8,
    shingle_k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The production near-dup pipeline: MinHash-LSH candidate
    generation followed by exact n-gram-Jaccard verification of ONLY the
    candidate pairs.

    This is the composition that scales: the quadratic verifier touches
    |candidates| pairs (LSH-bounded) instead of |docs|², and the
    verification join ships shingle sets for CANDIDATE ids only — docs
    is left-semi-joined against the distinct candidate-id set before
    shingling, so at corpus scale the verify stage shuffles |candidates|
    shingle sets, not the whole corpus.
    Returns (id1, id2, jaccard) with jaccard ≥ threshold, 4 dp.
    """
    pairs = lsh_candidate_pairs(
        df, text_col, id_col, n_hashes, bands, shingle_k
    ).localCheckpoint(eager=True)
    cand_ids = (
        pairs.select(F.col("id1").alias(id_col))
        .union(pairs.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    sh = F.array_distinct(word_shingles(tokens(F.col(text_col)), shingle_k))
    docs = (
        df.join(cand_ids, id_col, "left_semi")
        .select(F.col(id_col), sh.alias("sh"))
        .filter(F.size("sh") > 0)
    )
    a = docs.select(F.col(id_col).alias("id1"), F.col("sh").alias("sh1"))
    b = docs.select(F.col(id_col).alias("id2"), F.col("sh").alias("sh2"))
    inter = F.size(F.array_intersect("sh1", "sh2")).cast("double")
    union = F.size("sh1").cast("double") + F.size("sh2").cast("double") - inter
    return (
        pairs.join(a, "id1")
        .join(b, "id2")
        .select("id1", "id2", F.round(inter / union, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def with_simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 16,
    impl: str = "pandas",
) -> DataFrame:
    """16-bit SimHash per doc: bit j is the sign of the token-frequency-
    weighted sum of (2·bit_j(md5(token)) − 1).  Narrow, no shuffle.

    impl='pandas' (default): Arrow UDF with hashlib — identical values,
    ~20× the interpreted array-lambda path (see minhash_signatures).
    """
    if impl == "expr":
        toks = tokens(F.col(text_col))
        simhash = F.aggregate(
            F.sequence(F.lit(1), F.lit(bits)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.when(
                F.aggregate(
                    toks, F.lit(0), lambda a, t: a + (md5_bit(t, j) * 2 - 1)
                )
                >= 0,
                F.pow(F.lit(2.0), j - 1).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )
        return (
            df.select(F.col(id_col), F.size(toks).alias("n_tokens"), simhash.alias("simhash"))
            .filter(F.col("n_tokens") > 0)
            .drop("n_tokens")
        )

    import hashlib
    import re as _re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("simhash", LongType(), False),
        ]
    )
    ws = _re.compile(r"\s+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for batch in batches:
            ids, hashes = [], []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                toks = ws.split(text.strip()) if text and text.strip() else []
                if not toks:
                    continue
                sums = [0] * bits
                for t in toks:
                    hexd = md5(t.encode()).hexdigest()
                    for j in range(bits):
                        # same pseudo-random bit as exprs.md5_bit:
                        # parity of the (j+1)-th hex char's codepoint
                        sums[j] += (ord(hexd[j]) % 2) * 2 - 1
                sh = 0
                for j in range(bits):
                    if sums[j] >= 0:
                        sh += 1 << j
                ids.append(int(doc_id))
                hashes.append(sh)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"),
                 "simhash": pd.Series(hashes, dtype="int64")}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)


def simhash_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 16
) -> DataFrame:
    """Near-dup clustering proxy: docs bucketed by identical SimHash."""
    return (
        with_simhash(df, text_col, id_col, bits)
        .groupBy("simhash")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min(id_col).alias("keep_id"))
    )
