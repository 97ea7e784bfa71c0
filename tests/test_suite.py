"""Driver-contract smoke: every queries() entry constructs a DataFrame
against sf0.001 (eager barriers included), oracle keys line up, and
column names agree with what the oracle SQL emits (the driver's compare
sorts columns by name before hashing — a name drift fails the gate even
when values match)."""

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
        s_cols = fn(spark, "/root/testdata/sf0.001").columns
        assert s_cols, name
        if name in oracles:
            d_cols = [
                d[0]
                for d in con.execute(
                    f"SELECT * FROM ({oracles[name]}) LIMIT 0"
                ).description
            ]
            assert sorted(s_cols) == sorted(d_cols), name
