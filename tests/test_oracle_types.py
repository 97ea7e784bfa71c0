"""Driver-hash parity guard: no oracle may export decimal columns.

The driver's correctness gate hashes DuckDB results fetched over the
Arrow path, where HUGEINT (un-cast integer SUM) and bare numeric
literals export as decimal128 — value-equal to Spark's bigint/double
under Python ``==`` but hash-divergent under the driver.  Round 4 lost
three driver rows to this class (stream_host_rates, anchor_index,
linear_scores) and carried four latent ones; this test sweeps all
oracles' Arrow schemas so the class can never silently reappear.
DuckDB-only — no SparkSession needed.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata missing")
def test_no_decimal_columns_in_any_oracle():
    from tools.oracle_type_sweep import sweep

    bad = sweep(SF_DIR)
    assert not bad, (
        f"oracles exporting decimal/hugeint columns on the Arrow path "
        f"(driver hash will diverge from Spark bigint/double — add "
        f"CAST(... AS BIGINT/DOUBLE)): {bad}"
    )
