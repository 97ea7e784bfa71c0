"""Gopher symbol/layout signals hand-computed cases."""

from uniparser_spark.textops.clean import gopher_signals


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, page string")
    return gopher_signals(df, **kw).collect()[0]


def test_gopher_clean_doc_keeps(spark):
    r = _one(spark, "a clean line of prose\nanother tidy line here")
    assert (r["n_lines"], r["n_words"]) == (2, 9)
    assert r["symbol_word_ratio"] == 0.0
    assert r["alpha_word_frac"] == 1.0
    assert r["verdict"] == "keep"


def test_gopher_symbol_ratio_trips_first(spark):
    # 2 hashes + 1 ellipsis over 6 words = 0.5 > 0.1; also bullet-heavy,
    # but symbol_ratio has precedence
    r = _one(spark, "- a # b\n- c d... #")
    assert r["verdict"] == "symbol_ratio"
    assert r["bullet_line_frac"] == 1.0


def test_gopher_ellipsis_and_alpha(spark):
    # 1 ellipsis / 10 words = 0.1, NOT > 0.1: symbol rule stays quiet
    r = _one(
        spark, "trailing thought goes on and on...\nsecond line is fine here"
    )
    assert r["ellipsis_line_frac"] == 0.5
    assert r["verdict"] == "ellipsis_lines"
    # digits-only words fail the alpha rule once ellipsis is in bounds
    r2 = _one(spark, "1 2 3 4 five")
    assert r2["alpha_word_frac"] == 0.2
    assert r2["verdict"] == "alpha_words"


def test_gopher_unicode_bullet_and_ellipsis(spark):
    r = _one(spark, "• punkt eins\n• punkt zwei\nweiter im text…", max_bullet_frac=0.5)
    assert r["bullet_line_frac"] == 0.6667
    assert r["ellipsis_line_frac"] == 0.3333
    assert r["verdict"] == "bullet_lines"
