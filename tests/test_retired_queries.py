"""Local parity for queries RETIRED from the driver gate in the r13 swap.

The registry is capped at 200 rows (rotation saturation), so registering
the five r13 swap candidates required retiring five low-marginal-coverage
rows (COVERAGE.md "Retire-and-swap shortlist"). Retirement removes the
DRIVER gate slot, not the capability: the plan functions and oracles stay
in their modules, and this sweep keeps each hash-verified against DuckDB
every session — the same check the gate ran, minus the driver.

SURVEY §2 traceability for the retired semantics lives in surviving gate
rows: P10/A4 → groupby_having_dups, F7 → scalar_function_suite, F9/F10 →
datetime_function_suite, and the JSONL/ORC codec paths → the surviving
csv_roundtrip_rollup row plus tests/test_formats.py's sink/source matrix.
"""

from __future__ import annotations

import pytest

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import (
    formats,
    relational,
)
from tests.parity import assert_parity

pytestmark = pytest.mark.slow

_RETIRED = list(formats.RETIRED) + list(relational.RETIRED)


def test_retired_lists_are_disjoint_from_registry():
    """A retired row must not ALSO be registered (it would burn a gate
    slot the swap just freed)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES

    overlap = {name for name, _, _ in _RETIRED} & set(QUERIES)
    assert not overlap, f"retired queries still registered: {sorted(overlap)}"
    assert len(_RETIRED) == 5


@pytest.mark.parametrize(
    "name,fn,oracle", _RETIRED, ids=[name for name, _, _ in _RETIRED]
)
def test_retired_query_parity(spark, duck, sf_dir, name, fn, oracle):
    assert_parity(fn(spark, sf_dir), duck, oracle, name)
