"""Native chain compiler: differential equivalence vs the Python chain
executor, plan purity (no Python nodes for native rules), and fallback
mixing."""

import pytest
from pyspark.sql import functions as F

from uniparser_spark.chains import run_chain
from uniparser_spark.engine.native import compile_chain, extract_columns

TEXTS = [
    "the quick brown fox 123 jumps over 45 lazy dogs",
    "alpha,beta,gamma,delta",
    "  padded   text with 7 numbers 89 and words  ",
    "no-digits here!",
    "",
]

# chains inside the documented native envelope
NATIVE_CHAINS = [
    [["re", "[a-z]+", ""], ["python", "getitem", "[:3]"], ["python", "join", " "]],
    [["re", "[0-9]+", ""], ["python", "join", ","]],
    [["re", "q[a-z]+", "#0"]],
    [["re", "[aeiou]", "@_"]],
    [["python", "split", ","], ["python", "sort", "desc"], ["python", "join", "|"]],
    [["python", "strip", ""]],
    [["python", "base64_encode", ""]],
    [["python", "split", ","], ["python", "getitem", "[1]"]],
    [["python", "const", "fixed"]],
    [["python", "template", "val=$input_object!"]],
    [["python", "template", "$obj + ${input_object} + $unknown $$ 100%"]],
    [["re", "[a-z]+", ""], ["python", "join", "-"], ["python", "template", "<$obj>"]],
    [["loader", "b64encode", ""]],
    [["loader", "b64encode", ""], ["loader", "b64decode", ""]],
    [["loader", "b16encode", ""]],
    [["loader", "b16encode", ""], ["loader", "b16decode", ""]],
    [["python", "split", ""], ["python", "getitem", "[:4]"], ["python", "join", "+"]],
    [["re", "[0-9]+", "-"], ["python", "join", "/"]],
    [["re", ",", "-"], ["python", "join", ";"]],
]


@pytest.mark.parametrize("chain", NATIVE_CHAINS, ids=[str(c[0]) + str(len(c)) for c in NATIVE_CHAINS])
def test_native_matches_python_executor(spark, chain):
    fn = compile_chain(chain)
    assert fn is not None, f"chain should be native: {chain}"
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i long, text string")
    got = {r["i"]: r["out"] for r in df.select("i", fn(F.col("text")).alias("out")).collect()}
    for i, t in enumerate(TEXTS):
        want = run_chain(t, chain)
        if isinstance(want, Exception):
            continue  # error-as-value rows are the JSON surface's domain
        if isinstance(want, (list, tuple)):
            want = list(want)
            assert list(got[i] or []) == want, (chain, t, got[i], want)
        else:
            assert got[i] == want, (chain, t, got[i], want)


def test_native_time_roundtrip(spark):
    enc = compile_chain([["time", "encode", ""]])
    dec = compile_chain([["time", "decode", "%Y-%m-%d %H:%M"]])
    assert enc is not None and dec is not None
    df = spark.createDataFrame([("2024-01-01 00:00:07",), ("1999-12-31 23:59:59",)], "text string")
    rows = df.select(
        enc(F.col("text")).alias("epoch"),
        dec(enc(F.col("text"))).alias("back"),
    ).collect()
    for r, t in zip(rows, ["2024-01-01 00:00:07", "1999-12-31 23:59:59"]):
        assert r["epoch"] == run_chain(t, [["time", "encode", ""]])
        assert r["back"] == run_chain(
            run_chain(t, [["time", "encode", ""]]), [["time", "decode", "%Y-%m-%d %H:%M"]]
        )


def test_native_time_iso_literal(spark):
    """ISO 'T' (a literal letter) needs Java-format quoting; strftime
    passes it through — differential-checked both directions."""
    fmt = "%Y-%m-%dT%H:%M:%S"
    enc = compile_chain([["time", "encode", fmt]])
    dec = compile_chain([["time", "decode", fmt]])
    assert enc is not None and dec is not None
    df = spark.createDataFrame([("2024-06-01T12:30:07",)], "text string")
    row = df.select(
        enc(F.col("text")).alias("epoch"),
        dec(enc(F.col("text"))).alias("back"),
    ).collect()[0]
    assert row["epoch"] == run_chain("2024-06-01T12:30:07", [["time", "encode", fmt]])
    assert row["back"] == "2024-06-01T12:30:07"
    assert compile_chain([["time", "encode", "%Y%m%d5"]]) is None  # literal digit


def test_json_fast_path(spark):
    fn = compile_chain([["json", "k", ""]])
    assert fn is not None
    df = spark.createDataFrame([('{"k": 42}',), ('{"other": 1}',)], "text string")
    got = [r["o"] for r in df.select(fn(F.col("text")).alias("o")).collect()]
    assert got == ["42", None]


def test_non_native_chains_rejected():
    assert compile_chain([["css", "a", "@href"]]) is None
    assert compile_chain([["udf", "parse = lambda x: x", ""]]) is None
    assert compile_chain([["re", "(grouped)", ""]]) is None  # findall-group divergence
    assert compile_chain([["re", "(a)|b", "-"]]) is None  # split interleaves groups
    assert compile_chain([["re", "x*", "-"]]) is None  # zero-width match divergence
    assert compile_chain([["loader", "json", ""]]) is None  # loads a Python object
    assert compile_chain([["loader", "b85encode", ""]]) is None  # no native codec
    assert compile_chain([["python", "split", ","], ["json", "k", ""]]) is None  # mid-chain json
    # template/loader on a LIST would silently diverge (Template str()s
    # the list; loader maps element-wise) -> refused via arr tracking
    assert compile_chain([["python", "split", ","], ["python", "template", "$obj"]]) is None
    assert compile_chain([["re", "[a-z]+", ""], ["loader", "b64encode", ""]]) is None
    # ...but after re-scalarizing the chain they compile again
    assert compile_chain(
        [["python", "split", ","], ["python", "join", "-"], ["python", "template", "$obj"]]
    ) is not None


def test_extract_columns_plan_is_pure_jvm(spark):
    df = spark.createDataFrame([(f"u{i}", t) for i, t in enumerate(TEXTS)], "url string, text string")
    rules = [
        {"name": "first3", "chain_rules": [["re", "[a-z]+", ""], ["python", "getitem", "[:3]"], ["python", "join", " "]]},
        {"name": "nums", "chain_rules": [["re", "[0-9]+", ""], ["python", "join", ","]]},
    ]
    out = extract_columns(df, rules, fallback=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan, plan
    rows = {r["url"]: r for r in out.collect()}
    assert rows["u0"]["first3"] == "the quick brown"
    assert rows["u0"]["nums"] == "123,45"


def test_extract_columns_fallback_mixes(spark):
    df = spark.createDataFrame([("u0", "<p>hi there</p>")], "url string, text string")
    rules = [
        {"name": "native", "chain_rules": [["re", "[a-z]+", ""], ["python", "join", "-"]]},
        {"name": "dom", "chain_rules": [["css", "p", "$text"], ["python", "getitem", "[0]"]]},
    ]
    with pytest.raises(ValueError):
        extract_columns(df, rules, fallback=False)
    row = extract_columns(df, rules, fallback=True).collect()[0]
    assert row["native"] == "p-hi-there-p"
    assert '"hi there"' in row["dom"]
