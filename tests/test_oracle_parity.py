"""The local mirror of the driver's t2 gate: every registered query with an
oracle must match DuckDB on the same parquet tables."""

from __future__ import annotations

import pytest

from tests.parity import assert_parity

# full-registry sweep (201 cases, ~6 min): the driver's t2 gate mirror.
# In the `slow` tier — run before committing engine changes; the core
# tier (-m "not slow") keeps per-edit signal under 5 minutes.
pytestmark = [pytest.mark.slow, pytest.mark.parity]


def _cases():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,oracle", _cases(), ids=[c[0] for c in _cases()])
def test_query_parity(spark, duck, sf_dir, name, fn, oracle):
    df = fn(spark, sf_dir)
    if oracle is None:
        assert df.count() >= 0  # rows-only check, like the driver
        return
    assert_parity(df, duck, oracle, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0
