"""Driver-faithfulness type lint over EVERY registered oracle SQL.

Round-6 post-mortem: DuckDB 1.x types ``SUM(BIGINT)`` as HUGEINT
(int128). The builder's old tuple-equality check passed those oracles
(Python ``int == int``) while the driver's value-hash — which
serializes through Arrow/pandas, where HUGEINT is not an int64 —
failed exactly those 5 windowed queries (CORRECTNESS_r06.json). This
test makes that entire bug class unrepresentable: the ``DESCRIBE``
output of every ``oracle_sql()`` entry must stay inside the type
whitelist that is known to hash identically on both engines. Adding a
new oracle with an uncast SUM fails here long before the driver sees
it.

DuckDB-only (no SparkSession): DESCRIBE binds the query without
executing it, so the full 220-oracle sweep runs in seconds.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod
from big_data_computing__spark.sources.readers import TABLES
from tools.verify_oracle import DUCK_TYPE_WHITELIST

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def test_every_oracle_column_type_is_whitelisted(con):
    oracles = entrymod.oracle_sql()
    assert len(oracles) >= 220
    violations = []
    for name, sql in sorted(oracles.items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as e:  # noqa: BLE001 — collected, not hidden
            violations.append(f"{name}: DESCRIBE failed: {str(e)[:120]}")
            continue
        for col, typ, *_ in desc:
            if typ not in DUCK_TYPE_WHITELIST:
                violations.append(f"{name}.{col}: {typ}")
    assert not violations, (
        "oracle columns outside the driver-hash-safe whitelist "
        f"{sorted(DUCK_TYPE_WHITELIST)}:\n" + "\n".join(violations)
    )


def test_hugeint_is_what_duckdb_makes_of_uncast_sum(con):
    """Pin the failure mode itself so the whitelist's reason stays
    checkable: if a future DuckDB stops widening SUM(BIGINT) to
    HUGEINT, this test flags that the lint's premise changed."""
    (typ,) = [
        r[1]
        for r in con.execute(
            "DESCRIBE (SELECT SUM(CAST(1 AS BIGINT)) AS s)"
        ).fetchall()
    ]
    assert typ == "HUGEINT"
    assert typ not in DUCK_TYPE_WHITELIST
