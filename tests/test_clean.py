"""Corpus-cleaning operator tests (C4 / Gopher / RefinedWeb family).

Hand-computed expectations on crafted pages — the DuckDB oracle checks
the same operators over the synthesized sf corpus end-to-end.
"""

import pytest

from uniparser_spark.textops import (
    c4_line_filter,
    para_dedup,
    pii_redact,
    repetition_stats,
    top_tokens,
    with_page,
)


def _pages(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, page string")


def test_c4_line_filter_keeps_sentence_lines(spark):
    page = "\n".join(
        [
            "home about contact login",  # boilerplate marker -> drop
            "this line ends with a period.",  # keep
            "too short.",  # < 4 words -> drop
            "no terminal punctuation here",  # no '.' -> drop
            "another good sentence right here.",  # keep
            "copyright example com all rights reserved.",  # marker -> drop
        ]
    )
    out = c4_line_filter(_pages(spark, [(1, page)])).collect()[0]
    assert out["n_lines"] == 6
    assert out["n_kept"] == 2
    assert out["clean_text"] == (
        "this line ends with a period.\nanother good sentence right here."
    )


def test_c4_line_filter_empty_result_is_empty_string(spark):
    out = c4_line_filter(_pages(spark, [(1, "nothing to keep")])).collect()[0]
    assert out["n_kept"] == 0
    assert out["clean_text"] == ""


def test_repetition_stats_duplicate_fractions(spark):
    # 4 non-empty lines, one duplicated -> dup_line_frac = 1 - 3/4
    # 2 paragraphs, distinct -> dup_para_frac = 0
    page = "aa bb\ncc dd\naa bb\n\nlast para line"
    out = repetition_stats(_pages(spark, [(1, page)])).collect()[0]
    assert out["n_lines"] == 4
    assert out["dup_line_frac"] == pytest.approx(0.25)
    assert out["n_paras"] == 2
    assert out["dup_para_frac"] == 0.0
    assert out["max_line_len"] == len("last para line")
    assert out["avg_line_len"] == pytest.approx((5 + 5 + 5 + 14) / 4)


def test_pii_redact_counts_and_placeholders(spark):
    page = (
        "mail a.user@example.org or b@test.io, "
        "server 10.1.2.3, call +1 555 1234 now"
    )
    out = pii_redact(_pages(spark, [(1, page)])).collect()[0]
    assert (out["n_emails"], out["n_ips"], out["n_phones"]) == (2, 1, 1)
    assert out["redacted"] == (
        "mail <EMAIL> or <EMAIL>, server <IP>, call <PHONE> now"
    )


def test_para_dedup_keep_first_across_corpus(spark):
    shared = "shared boilerplate paragraph"
    rows = [
        (1, f"{shared}\n\nunique one"),
        (2, f"{shared}\n\nunique two\n\n{shared}"),
        (3, f"{shared}"),
    ]
    out = {
        r["doc_id"]: r for r in para_dedup(_pages(spark, rows)).collect()
    }
    # doc 1 owns the first occurrence of the shared paragraph
    assert out[1]["n_paras"] == 2 and out[1]["n_kept"] == 2
    assert out[1]["clean_text"] == f"{shared}\n\nunique one"
    # doc 2 loses both copies of it, keeps its unique paragraph
    assert out[2]["n_paras"] == 3 and out[2]["n_kept"] == 1
    assert out[2]["clean_text"] == "unique two"
    # doc 3 loses everything -> no surviving row (mirrored by the oracle)
    assert 3 not in out


def test_top_tokens_orders_by_count_then_token(spark):
    df = spark.createDataFrame(
        [(1, "b a b c"), (2, "a b x")], "doc_id long, text string"
    )
    rows = top_tokens(df, k=3).collect()
    assert [tuple(r) for r in rows] == [("b", 3, 2), ("a", 2, 2), ("c", 1, 1)]


def test_synth_page_structure(spark):
    df = spark.createDataFrame(
        [(7, "one two three four five six seven eight nine ten")],
        "doc_id long, text string",
    )
    page = with_page(df).collect()[0]["page"]
    paras = page.split("\n\n")
    # header | body | repeated first line | PII | footer
    assert paras[0] == "home about contact login"
    assert paras[-1] == "copyright example com all rights reserved."
    assert "user7@example.com" in paras[-2] and "+1 555 1007" in paras[-2]
    body = paras[1]
    assert body.split("\n")[0] == "one two three four five six seven eight"
    assert paras[2] == body.split("\n")[0]


def test_ngram_repetition_top_fraction(spark):
    from uniparser_spark.textops.clean import ngram_repetition

    # "a b" occurs 3x among 5 bigrams; top trigram "a b a" occurs 2x
    df = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "x y")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_repetition(df).collect()}
    assert out[1]["n_tokens"] == 6
    assert out[1]["top_2gram_cnt"] == 3
    assert out[1]["top_2gram_frac"] == 1.0
    assert out[1]["top_3gram_cnt"] == 2
    assert out[1]["top_3gram_frac"] == 1.0
    # doc 2 has one bigram, no trigram -> null trigram columns
    assert out[2]["top_2gram_cnt"] == 1
    assert out[2]["top_3gram_cnt"] is None


def test_text_normalize_nfc_and_folding(spark):
    from uniparser_spark.textops.clean import text_normalize

    decomposed = "cafe\u0301 u\u0308ber"  # e+acute, u+umlaut (decomposed)
    df = spark.createDataFrame(
        [(1, decomposed), (2, "caf\u00e9 plain")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text_normalize(df).collect()}
    assert out[1]["nfc"] == "caf\u00e9 \u00fcber"
    assert out[1]["changed"] is True
    assert out[1]["n_chars_raw"] == len(decomposed)
    assert out[1]["n_chars_nfc"] == len("caf\u00e9 \u00fcber")
    assert out[1]["folded"] == "cafe uber"
    assert out[2]["changed"] is False
    assert out[2]["folded"] == "cafe plain"


def test_doc_filter_reasons_in_order(spark):
    from uniparser_spark.textops.clean import doc_filter

    long_clean = " ".join(f"word{i}" for i in range(70))
    short = "just a few words here"
    # 70 distinct tokens but every line duplicated -> repetition
    repetitive = "\n".join(["dup line words here"] * 5 + [long_clean])
    boiler = long_clean + " lorem ipsum"
    rows = [(1, long_clean), (2, short), (3, repetitive), (4, boiler)]
    out = {
        r["doc_id"]: r
        for r in doc_filter(
            spark.createDataFrame(rows, "doc_id long, page string")
        ).collect()
    }
    assert out[1]["admit"] is True and out[1]["reason"] is None
    assert out[2]["reason"] == "too_short"
    assert out[3]["reason"] == "repetition" and out[3]["admit"] is False
    assert out[4]["reason"] == "boilerplate"


# ------------------------------------------------------------ wordlist_filter
def test_wordlist_filter_exact_token_matching(spark):
    from uniparser_spark.textops.clean import wordlist_filter

    docs = spark.createDataFrame(
        [
            (1, "the Glass is half full"),     # 'glass' blocked (case-fold)
            (2, "a classroom has classes"),    # substring only: admitted
            (3, "clean text entirely"),
            (4, ""),                            # empty: admitted, 0 tokens
            (5, "glass glass glass"),           # repeated hits counted
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in wordlist_filter(docs, words=["GLASS", "ass"]).collect()
    }
    assert got[1]["n_flagged"] == 1 and got[1]["admitted"] == 0
    # the C4 word-boundary contract: 'classroom'/'classes' never match
    assert got[2]["n_flagged"] == 0 and got[2]["admitted"] == 1
    assert got[3]["admitted"] == 1
    assert got[4] == {
        "doc_id": 4, "n_tokens": 0, "n_flagged": 0,
        "flagged_frac": 0.0, "admitted": 1,
    }
    assert got[5]["n_flagged"] == 3 and got[5]["flagged_frac"] == 1.0


def test_lang_script_check_verdicts(spark):
    from uniparser_spark.textops.quality import lang_script_check

    rows = [
        (1, "en", "plain english words here"),
        (2, "zh", "actually latin text tagged zh"),
        (3, "zh", "猫狗鸟鱼虫木火水"),
        (4, "tlh", "no expectation for klingon"),
        (5, "ru", "кот система"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in lang_script_check(df).collect()}
    assert got[1]["verdict"] == "ok"
    assert (got[2]["verdict"], got[2]["main_script"]) == ("mismatch", "latin")
    assert got[3]["verdict"] == "ok"
    assert got[4]["verdict"] == "no_expectation"
    assert (got[5]["verdict"], got[5]["expected_script"]) == ("ok", "cyrillic")
