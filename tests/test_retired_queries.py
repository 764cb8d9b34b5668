"""Local parity for queries RETIRED from the driver gate (r13-r15 swaps).

The registry is capped at 200 rows (rotation saturation), so registering
new capabilities requires retiring low-marginal-coverage rows in the same
round (COVERAGE.md "Retire-and-swap"): five in r13, two in r14
(scalable_surrogate_key, rollup_subtotals — freeing slots for the
generational rollback-probe and streaming-maintenance rows), and two in
r15 (embedding_ivf_topk, multimodal_frame_sample — freeing slots for the
PNG-codec image-stats row and the generational fleet-catalog row).
Retirement removes the DRIVER gate slot, not the capability: the plan
functions and oracles stay in their modules, and this sweep keeps each
hash-verified against DuckDB every session — the same check the gate ran,
minus the driver.

SURVEY §2 traceability for the retired semantics lives in surviving gate
rows: P10/A4 → groupby_having_dups, F7 → scalar_function_suite, F9 →
datetime_function_suite's ist_ts column, F10 → the flagship's dd/MM/yyyy
render, W1 → sequential_surrogate_key (the reference-exact form), the
grouping-set family → grouping_sets_subtotals + cube_subtotals, and the
JSONL/ORC codec paths → the surviving csv_roundtrip_rollup row plus
tests/test_formats.py's sink/source matrix. The r15 retirees' semantics
stay gate-covered too: embedding_ivf_topk's EMBEDDING_IVF_ORACLE is the
gate oracle of six surviving rows (indexed/compacted/append + the three
generational probes), and multimodal_frame_sample's mapInPandas 1→N
Arrow fan-out is the same plumbing the surviving multimodal_audio_energy
row hash-gates.
"""

from __future__ import annotations

import pytest

from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import (
    formats,
    llm_ops,
    relational,
)
from tests.parity import assert_parity

pytestmark = [pytest.mark.slow, pytest.mark.parity]

_RETIRED = list(formats.RETIRED) + list(relational.RETIRED) + list(llm_ops.RETIRED)


def test_retired_lists_are_disjoint_from_registry():
    """A retired row must not ALSO be registered (it would burn a gate
    slot the swap just freed)."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.registry import QUERIES

    overlap = {name for name, _, _ in _RETIRED} & set(QUERIES)
    assert not overlap, f"retired queries still registered: {sorted(overlap)}"
    assert len(_RETIRED) == 9


@pytest.mark.parametrize(
    "name,fn,oracle", _RETIRED, ids=[name for name, _, _ in _RETIRED]
)
def test_retired_query_parity(spark, duck, sf_dir, name, fn, oracle):
    assert_parity(fn(spark, sf_dir), duck, oracle, name)
