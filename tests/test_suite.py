"""Driver-contract smoke: every queries() entry constructs a DataFrame
against sf0.001 (eager barriers included), oracle keys line up, and
column names agree with what the oracle SQL emits (the driver's compare
sorts columns by name before hashing — a name drift fails the gate even
when values match).

Plan hygiene rides the same pass: NO query may contain a
row-at-a-time Python UDF (BatchEvalPython — Arrow-batched
ArrowEvalPython/MapInPandas are the sanctioned Python paths) or an
unbounded CartesianProduct (broadcast nested-loop against a small
side is the accepted form) — the two anti-patterns that silently
stop surviving a 100x scale-up."""

import duckdb


def test_suite_contract(spark):
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/sf0.001/{t}.parquet'"
        )
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        s_cols = df.columns
        assert s_cols, name
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: unbounded cartesian"
        if name in oracles:
            d_cols = [
                d[0]
                for d in con.execute(
                    f"SELECT * FROM ({oracles[name]}) LIMIT 0"
                ).description
            ]
            assert sorted(s_cols) == sorted(d_cols), name
