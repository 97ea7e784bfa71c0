"""Text analysis: token stats, quality scoring, language ID, fingerprints.

All pure DataFrame expressions (whole-stage codegen; the parquet scan
reads only (id, text) — column pruning visible in .explain as ReadSchema).
Ratios are double precision rounded to 4 decimals so they hash-match the
DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .exprs import h16, tokens, word_shingles

# Tiny per-language stopword lists for the n-gram-free heuristic
# language-ID below.  Chosen for mutual exclusivity, not linguistic
# completeness — the operator contract is determinism, and the oracle
# recomputes the identical vote.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans"),
    "es": ("el", "los", "las", "es", "un", "una", "en", "que"),
}

# BPE-ish pre-tokenization: letter runs, digit runs, single other glyphs
BPE_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"


def _sw_count(toks: Column, words) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document token counting: whitespace tokens, distinct tokens,
    BPE-ish regex tokens, mean token length (4-dp)."""
    toks = tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_RE), F.lit(0))).alias(
            "n_bpe_tokens"
        ),
        F.round(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t))
            / F.size(toks).cast("double"),
            4,
        ).alias("avg_token_len"),
    )


def quality_scores(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length score, stopword ratio,
    punctuation ratio, repetition ratio → weighted 0-1 score.

    Mirrors the shape of C4/Gopher-style quality rules; every term is a
    built-in expression so the whole score evaluates inside codegen.
    """
    toks = tokens(F.col(text_col))
    n_chars = F.length(F.col(text_col)).cast("double")
    n_tok = F.size(toks).cast("double")
    sw = _sw_count(toks, STOPWORDS["en"]).cast("double")
    punct = (
        n_chars
        - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", "")).cast("double")
    )
    distinct_ratio = F.size(F.array_distinct(toks)).cast("double") / n_tok
    len_score = F.least(F.lit(1.0), n_chars / F.lit(500.0))
    sw_ratio = sw / n_tok
    punct_ratio = punct / n_chars
    quality = F.round(
        F.lit(0.4) * len_score
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.2) * (F.lit(1.0) - punct_ratio)
        + F.lit(0.1) * F.least(F.lit(1.0), sw_ratio * F.lit(5.0)),
        4,
    )
    return df.select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_tok.cast("long").alias("n_tokens"),
        F.round(sw_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        quality.alias("quality"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID (deterministic heuristic).

    Vote = count of language-specific stopwords among tokens; prediction
    = argmax with fixed tie-break order en > de > fr > es > und.
    """
    toks = tokens(F.lower(F.col(text_col)))
    votes = {lang: _sw_count(toks, words) for lang, words in STOPWORDS.items()}
    best = F.greatest(*votes.values())
    pred = (
        F.when(best == 0, F.lit("und"))
        .when(votes["en"] == best, F.lit("en"))
        .when(votes["de"] == best, F.lit("de"))
        .when(votes["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        *[votes[lang].alias(f"votes_{lang}") for lang in STOPWORDS],
    )


def doc_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    impl: str = "pandas",
) -> DataFrame:
    """Document fingerprinting: whole-doc content hash over normalized
    text plus a winnowing-style min-gram fingerprint (min of word
    k-gram hashes — stable under local edits).

    impl='pandas' (default) computes the per-gram md5 minima in an
    Arrow-batched UDF — Spark's interpreted array lambdas cost ~20µs
    per element, ~20× hashlib (same tradeoff as MinHash signatures);
    values are identical either way.
    """
    if impl == "expr":
        norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
        toks = tokens(norm)
        grams = word_shingles(toks, k)
        return df.select(
            F.col(id_col),
            h16(norm).alias("content_fp"),
            F.array_min(F.transform(grams, h16)).alias("min_gram_fp"),
        )

    import hashlib
    import re as _re
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("content_fp", StringType(), False),
            StructField("min_gram_fp", StringType(), True),
        ]
    )
    ws = _re.compile(r"\s+")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        md5 = hashlib.md5
        for batch in batches:
            ids, cfps, mfps = [], [], []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                norm = " ".join(ws.split((text or "").lower())).strip()
                toks = norm.split(" ") if norm else []
                n_grams = len(toks) - k + 1
                mfp = (
                    min(
                        md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:16]
                        for i in range(n_grams)
                    )
                    if n_grams > 0
                    else None
                )
                ids.append(int(doc_id))
                cfps.append(md5(norm.encode()).hexdigest()[:16])
                mfps.append(mfp)
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "content_fp": cfps,
                 "min_gram_fp": mfps}
            )

    return df.select(id_col, text_col).mapInPandas(run, schema=schema)
