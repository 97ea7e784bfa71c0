"""DOM structural fingerprinting (textops/structure.py) tests."""

import hashlib

from uniparser_spark.textops.structure import (
    dom_structure,
    page_structure,
    template_stats,
)


def _md5(s):
    return hashlib.md5(s.encode()).hexdigest()


def test_page_structure_shape_only():
    fp1 = page_structure("<html><body><h1>AAA</h1><p>x</p></body></html>")
    fp2 = page_structure("<html><body><h1>totally different</h1><p></p></body></html>")
    assert fp1[0] == fp2[0] == _md5("html,body,h1,p")  # text never changes shape
    assert fp1[1:] == (4, 3, "h1", 1)


def test_page_structure_depth_outline_and_empty():
    fp, n, depth, heads, nh = page_structure(
        "<div><div><div><h2>a</h2></div></div><h3>b</h3></div>"
    )
    assert (n, depth) == (5, 4)
    assert (heads, nh) == ("h2,h3", 2)  # document order, not depth order
    assert page_structure("just text, no tags") == (_md5(""), 0, 0, None, 0)


def test_deep_nesting_no_recursion_limit():
    html = "<div>" * 2000 + "x" + "</div>" * 2000
    fp, n, depth, heads, nh = page_structure(html)
    assert (n, depth) == (2000, 2000)
    assert fp == _md5(",".join(["div"] * 2000))


def test_template_stats_rollup(spark):
    pages = spark.createDataFrame(
        [
            (1, "a.ex", "<html><body><p>x</p></body></html>"),
            (2, "a.ex", "<html><body><p>y</p></body></html>"),
            (3, "a.ex", "<html><body><h1>z</h1></body></html>"),
            (4, "b.ex", "<html><body><h1>w</h1></body></html>"),
        ],
        "doc_id long, host string, html string",
    )
    s = dom_structure(pages).join(pages.select("doc_id", "host"), "doc_id")
    out = {r["host"]: r for r in template_stats(s).collect()}
    a = out["a.ex"]
    assert (a["n_pages"], a["n_templates"]) == (3, 2)
    assert a["top_fp"] == _md5("html,body,p")
    assert a["top_share"] == 0.6667
    assert out["b.ex"]["top_share"] == 1.0


# ------------------------------------------------------------ page_tables
def test_page_tables_nested_table_ownership():
    from uniparser_spark.textops.structure import page_tables

    rows = page_tables(
        "<html><body><table><tr><td>x "
        "<table><tr><td>in</td></tr></table></td>"
        "<td>y</td></tr></table></body></html>"
    )
    # outer row owns both cells; nested table gets its own index
    assert rows == [
        (0, 0, 0, 2, "x in|y"),
        (1, 0, 0, 1, "in"),
    ]


def test_page_tables_section_wrappers_and_headers():
    from uniparser_spark.textops.structure import page_tables

    rows = page_tables(
        "<table><thead><tr><th>H1</th><th>H2</th></tr></thead>"
        "<tbody><tr><td>a</td><th>b</th></tr></tbody>"
        "<tfoot><tr><td>f</td></tr></tfoot></table>"
    )
    # thead/tbody/tfoot transparent, row_idx document-ordered;
    # mixed th+td row is NOT a header row
    assert rows == [
        (0, 0, 1, 2, "H1|H2"),
        (0, 1, 0, 2, "a|b"),
        (0, 2, 0, 1, "f"),
    ]


def test_page_tables_empty_row_and_whitespace_collapse():
    from uniparser_spark.textops.structure import page_tables

    rows = page_tables(
        "<table><tr></tr><tr><td>  a \n  <b>bold</b>  text </td></tr></table>"
    )
    assert rows == [
        (0, 0, 0, 0, ""),
        (0, 1, 0, 1, "a bold text"),
    ]
    assert page_tables("<p>none</p>") == []


def test_extract_tables_spark_surface(spark):
    from uniparser_spark.textops.structure import extract_tables

    pages = spark.createDataFrame(
        [
            (1, "<table><tr><th>k</th></tr><tr><td>v</td></tr></table>"),
            (2, "<p>no table</p>"),
        ],
        "doc_id long, html string",
    )
    got = sorted(
        (r["doc_id"], r["table_idx"], r["row_idx"], r["is_header"], r["cells"])
        for r in extract_tables(pages).collect()
    )
    assert got == [(1, 0, 0, 1, "k"), (1, 0, 1, 0, "v")]


try:
    from hypothesis import given, settings, strategies as st

    _tableish = st.lists(
        st.one_of(
            st.sampled_from(
                ["<table>", "</table>", "<tr>", "</tr>", "<td>", "</td>",
                 "<th>", "</th>", "<thead>", "</thead>", "<tbody>",
                 "</tbody>", "<tfoot>", "<div>", "<!--", "-->", "<",
                 ">", "&", "]]>", "<![CDATA[", '<td colspan="2">']
            ),
            st.text(max_size=8),
        ),
        max_size=30,
    ).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(_tableish)
    def test_fuzz_page_tables_total(markup):
        """page_tables is total over arbitrary markup: every emitted row
        is well-typed and internally consistent — never an exception."""
        from uniparser_spark.textops.structure import page_tables

        for t_idx, r_idx, is_h, n, cells in page_tables(markup):
            assert t_idx >= 0 and r_idx >= 0
            assert is_h in (0, 1)
            assert n >= 0
            assert isinstance(cells, str)
            assert (n == 0) == (cells == "") or n > 0

except ImportError:  # pragma: no cover
    pass
