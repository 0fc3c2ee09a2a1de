"""Driver-contract smoke: entry() runs, queries() keys run at sf0.001,
oracle keys line up with query keys."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="driver testdata absent")


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"sink", "n_rows"} <= set(df.columns)
    assert sum(r.n_rows for r in rows) == 500  # sf0.001 documents rows


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 30


@pytest.mark.parametrize("key", sorted(entry_mod.queries()))
def test_each_query_runs(spark, key):
    df = entry_mod.queries()[key](spark, SF)
    assert df.count() >= 0  # materializes without error
