"""Driver-contract self-consistency: every ``queries()`` entry has an
``oracle_sql()`` entry (the hard-verification bar this repo holds
itself to — no rows-only checks), every oracle parses in DuckDB
against the testdata views, and there are no orphan oracles."""

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
SF = "/root/testdata/sf0.01"


def test_every_query_has_an_oracle():
    q = set(entry_mod.queries().keys())
    o = set(entry_mod.oracle_sql().keys())
    assert q - o == set(), f"queries without oracle: {sorted(q - o)}"
    assert o - q == set(), f"orphan oracles: {sorted(o - q)}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_sql_parses_in_duckdb(name):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    # EXPLAIN = parse + bind + plan without executing the O(n^2) ones
    con.execute("EXPLAIN " + entry_mod.oracle_sql()[name])
