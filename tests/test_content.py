"""Main-content extraction heuristic: hand-derived expectations on
crafted pages (the oracle row covers the synthesized-corpus shape; these
pin the scoring rules themselves)."""

from uniparser_spark.textops.content import extract_main, extract_main_content


def test_article_beats_link_sidebar():
    html = (
        "<html><body>"
        '<nav><a href="/">home</a><a href="/x">login</a></nav>'
        '<div class="side"><a href="/a">sponsored one</a>'
        '<a href="/b">sponsored two</a></div>'
        "<article><p>real content words here</p><p>and a second paragraph</p>"
        "</article><footer>copyright</footer></body></html>"
    )
    tag, text, n_paras, main_len = extract_main(html)
    assert tag == "article"
    assert text == "real content words here\nand a second paragraph"
    assert n_paras == 2
    assert main_len == len(text)


def test_plain_div_wins_without_semantic_tags():
    html = (
        "<html><body>"
        '<div id="menu"><a href="/">one</a><a href="/2">two</a></div>'
        "<div id='story'>long enough plain text block that scores highest"
        " of all the candidates</div>"
        "</body></html>"
    )
    tag, text, n_paras, _ = extract_main(html)
    assert tag == "div"
    assert text.startswith("long enough plain text")
    assert n_paras == 0  # no <p>: falls back to the normalized block text


def test_candidate_inside_chrome_is_skipped():
    html = (
        "<html><body>"
        "<footer><div>footer text that is quite long but lives in chrome"
        " so it must never win the content race</div></footer>"
        "<article><p>short body</p></article>"
        "</body></html>"
    )
    tag, text, _, _ = extract_main(html)
    assert tag == "article"
    assert text == "short body"


def test_body_fallback_when_nothing_scores():
    html = "<html><body>bare words outside any container</body></html>"
    tag, text, n_paras, _ = extract_main(html)
    assert tag == "body"
    assert text == "bare words outside any container"
    assert n_paras == 0


def test_whitespace_normalization_and_paragraph_joins():
    html = (
        "<article><p>  spaced   out\n tokens </p><p></p>"
        "<p>tail</p></article>"
    )
    _, text, n_paras, _ = extract_main(f"<html><body>{html}</body></html>")
    assert text == "spaced out tokens\n\ntail"
    assert n_paras == 3


def test_spark_surface(spark):
    df = spark.createDataFrame(
        [(1, "<html><body><article><p>alpha beta</p></article></body></html>")],
        "doc_id long, html string",
    )
    row = extract_main_content(df).collect()[0]
    assert (row["main_tag"], row["main_text"], row["n_paras"], row["main_len"]) == (
        "article",
        "alpha beta",
        1,
        10,
    )
