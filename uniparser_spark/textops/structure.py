"""DOM structural fingerprinting: template detection over page shape.

Boilerplate-heavy sites render every page from a handful of templates;
the tag SHAPE of a page (its pre-order element-tag sequence) is a far
stronger template key than any content hash.  Pipelines use it to
cluster pages per host into templates (one extraction rule per
template), to spot template drift (a site redesign silently breaking a
rule — complements engine/health.py's error-rate view with a structural
early warning), and as a cheap layout feature for quality models.

Contract (documented so the DuckDB oracle can predict it on synthesized
pages):

- ``template_fp``: md5 hex of the comma-joined pre-order element-tag
  sequence (the repo's portable hash family — the oracle computes
  ``md5('html,body,div,p,...')`` from the fixture's known shape).
- ``n_nodes``: element count (text/comment nodes excluded).
- ``max_depth``: deepest element's depth, root's children = 1; 0 for a
  page with no elements.
- ``heading_seq``: comma-joined h1–h6 tags in document order (the
  outline shape, e.g. ``h1,h2,h2``); NULL when the page has no
  headings.
- ``n_headings``: length of that sequence.

Spark shape: ONE ``mapInPandas`` crossing, one DOM parse per page, one
explicit-stack pre-order walk (no recursion limit risk on pathological
nesting), narrow output rows.  The per-host template rollup downstream
is a map-side-combinable count on (host, template_fp) — 16-byte keys,
no page bytes in the shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame

from ..dom.html import parse_html
from ..dom.nodes import Element

_HEADINGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})


def page_structure(html: str) -> Tuple[str, int, int, Optional[str], int]:
    """(template_fp, n_nodes, max_depth, heading_seq, n_headings)."""
    doc = parse_html(html)
    tags = []
    heads = []
    max_depth = 0
    stack = [
        (c, 1)
        for c in reversed([c for c in doc.children if isinstance(c, Element)])
    ]
    while stack:
        el, depth = stack.pop()
        tags.append(el.tag)
        if depth > max_depth:
            max_depth = depth
        if el.tag in _HEADINGS:
            heads.append(el.tag)
        for c in reversed(el.children):
            if isinstance(c, Element):
                stack.append((c, depth + 1))
    fp = hashlib.md5(",".join(tags).encode("utf-8")).hexdigest()
    return (
        fp,
        len(tags),
        max_depth,
        ",".join(heads) if heads else None,
        len(heads),
    )


def template_stats(
    struct: DataFrame, host_col: str = "host", fp_col: str = "template_fp"
) -> DataFrame:
    """Per-host template census over :func:`dom_structure` output:
    ``(host, n_pages, n_templates, top_fp, top_share)``.  Top template
    under a (count desc, fp asc) total order; share rounded to 4 dp.
    Two map-side-combinable count shuffles on (host, fp) / host."""
    from pyspark.sql import functions as F

    per = struct.groupBy(
        F.col(host_col).alias("host"), F.col(fp_col).alias("fp")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        per.groupBy("host")
        .agg(
            F.sum("n").alias("n_pages"),
            F.count(F.lit(1)).alias("n_templates"),
            F.min_by(
                "fp", F.struct((-F.col("n")).alias("a"), F.col("fp"))
            ).alias("top_fp"),
            F.max("n").alias("_top_n"),
        )
        .select(
            "host",
            "n_pages",
            "n_templates",
            "top_fp",
            F.round(F.col("_top_n") / F.col("n_pages"), 4).alias("top_share"),
        )
    )


def dom_structure(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """Structural fingerprint per page as one Arrow crossing."""
    schema = (
        f"{id_col} long, template_fp string, n_nodes int, max_depth int, "
        "heading_seq string, n_headings int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [page_structure(h) for h in pdf[html_col]]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "template_fp": [r[0] for r in rows],
                    "n_nodes": pd.array([r[1] for r in rows], dtype="int32"),
                    "max_depth": pd.array([r[2] for r in rows], dtype="int32"),
                    "heading_seq": [r[3] for r in rows],
                    "n_headings": pd.array([r[4] for r in rows], dtype="int32"),
                }
            )

    return df.select(id_col, html_col).mapInPandas(run, schema=schema)
