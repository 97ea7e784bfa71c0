"""Anchor-text link extraction (crawl/links.py)."""

from uniparser_spark.crawl.links import link_edges, links_from_html


def test_links_from_html_resolution_and_flags(spark):
    html = (
        '<html><body>'
        '<a href="/rel">  Rel\n Link </a>'
        '<a href="sub/page">Child</a>'
        '<a href="https://other.net/x" rel="external nofollow">Out</a>'
        '<a href="//cdn.org/y">Proto</a>'
        '<a href="#frag">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a>no href</a>'
        '<a href="/self"><b>bold</b> tail</a>'
        "</body></html>"
    )
    pages = spark.createDataFrame(
        [("https://a.org/dir/page", html)], "url string, html string"
    )
    rows = [r.asDict() for r in links_from_html(pages).orderBy("link_idx").collect()]
    assert [r["dst"] for r in rows] == [
        "https://a.org/rel",
        "https://a.org/dir/sub/page",
        "https://other.net/x",
        "https://cdn.org/y",
        "https://a.org/self",
    ]
    assert [r["anchor"] for r in rows] == [
        "Rel Link", "Child", "Out", "Proto", "bold tail"
    ]
    assert [r["link_idx"] for r in rows] == [0, 1, 2, 3, 4]
    assert [r["nofollow"] for r in rows] == [0, 0, 1, 0, 0]
    assert [r["internal"] for r in rows] == [1, 1, 0, 0, 1]
    assert all(r["src"] == "https://a.org/dir/page" for r in rows)


def test_links_binary_html_and_edges(spark):
    html = (
        '<a href="https://b.org/1">one</a>'
        '<a href="https://b.org/1">dup</a>'
        '<a href="https://A.org/p">self-case</a>'
        '<a href="https://c.org/n" rel="nofollow">nf</a>'
    ).encode("utf-8")
    pages = spark.createDataFrame(
        [("https://a.org/p", bytearray(html))], "url string, html binary"
    )
    links = links_from_html(pages)
    assert links.count() == 4
    edges = link_edges(links)
    # dup collapses, nofollow dropped, case-folded self-loop dropped
    assert edges.count() == 1
    with_nf = link_edges(links, follow_only=False)
    assert with_nf.count() == 2


def test_links_feed_pagerank(spark):
    """Closing the loop: pages -> link table -> pagerank runs."""
    from uniparser_spark.graph import pagerank

    rows = [
        ("https://a.org/", '<a href="/b">b</a><a href="/c">c</a>'),
        ("https://a.org/b", '<a href="/c">c</a>'),
        ("https://a.org/c", '<a href="/">home</a>'),
    ]
    links = links_from_html(
        spark.createDataFrame(rows, "url string, html string")
    )
    edges = link_edges(links)
    nodes = (
        links.selectExpr("xxhash64(lower(src)) AS node")
        .union(links.selectExpr("xxhash64(lower(dst)) AS node"))
        .distinct()
    )
    pr = {
        r["node"]: r["rank"]
        for r in pagerank(edges, nodes, n_nodes=3, iters=3).collect()
    }
    assert len(pr) == 3 and abs(sum(pr.values()) - 1.0) < 1e-9
