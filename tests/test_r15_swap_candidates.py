"""Gate-shaped parity for the r15 registry swap rows (staged round 14,
REGISTERED round 15 — see COVERAGE.md "Round-15 delta").

Same staging rhythm as rounds 12→13 and 13→14: the registry is
rotation-saturated at 200 rows, so new capabilities carry
driver-gate-shaped parity checks HERE until a swap frees slots —
registration then is a REGISTRY-entry edit plus a retirement, zero new
validation work. Each test mirrors the driver's t2 gate exactly
(``assert_parity`` = row count + sorted columns + canonical value
multiset vs DuckDB).

The two candidates extend the two newest operator families:
``multimodal_image_stats`` hash-gates the REAL stdlib PNG codec path
(encode cycling all five scanline filters → native decode → exact
integer pixel stats the oracle replays from the raw bytes), and
``gen_index_catalog_report`` gates the generational index's fleet-view
invariants (head sequence / served kind / corpus accounting / retention
span) over two indexes held in known lifecycle states.
"""

from __future__ import annotations

import pytest

from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # a PNG per document + stored-index builds


def test_multimodal_image_stats_parity(spark, duck, sf_dir):
    """r15 candidate 1: encode→decode through the real PNG codec on
    every corpus row, hash-verified — the gate row a r15 registration
    would add."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        IMAGE_STATS_ORACLE,
        multimodal_image_stats,
    )

    assert_parity(
        multimodal_image_stats(spark, sf_dir),
        duck,
        IMAGE_STATS_ORACLE,
        "multimodal_image_stats",
    )


def test_gen_index_catalog_report_parity(spark, duck, sf_dir):
    """r15 candidate 2: the fleet catalog's protocol invariants over a
    build-only and a rolled-back index, hash-verified."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        GEN_CATALOG_ORACLE,
        gen_index_catalog_report,
    )

    assert_parity(
        gen_index_catalog_report(spark, sf_dir),
        duck,
        GEN_CATALOG_ORACLE,
        "gen_index_catalog_report",
    )


def test_gen_index_catalog_report_recovers_from_crash_state(
    spark, sf_dir, tmp_path
):
    """The rolled-back index must converge from the state a crash leaves
    behind: head re-pointed AT the append snapshot (crash between append
    and rollback) heals back to serving the build snapshot.

    Runs against a SYMLINKED sf_dir so the crash mutation lands on its
    own index pair (``_sf_tag`` keys the index name off the dir name):
    the registered gate row and the parity test above keep their clean
    3/3 lifecycle regardless of test ordering."""
    import os

    import glue_job_to_write_structured_data_on_s3_full_code_spark.operators.index_store as gs
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        _sf_tag,
        gen_index_catalog_report,
    )

    crash_dir = str(tmp_path / "sf_crash")
    os.symlink(os.path.abspath(sf_dir), crash_dir)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    want = rows(gen_index_catalog_report(spark, crash_dir))
    name = f"gen_cat_rb_{_sf_tag(crash_dir)}"
    # simulate the crash: re-point the head at the APPEND snapshot
    # (sequence 2), leaving the ledger tail off the build generation
    root = gs._store_root(spark, name)
    ptr = gs._store_for(root)
    head_seq, _ = ptr.read_latest()
    append_payload = ptr.read_at(2)
    assert append_payload is not None
    assert ptr.try_commit(head_seq + 1, dict(append_payload))
    # the next invocation inspects the ledger and rolls back again. The
    # report is NOT identical to the clean run: the external re-point
    # (seq 4) plus the healing rollback (seq 5) are real commits, so the
    # healed index retains five pointers at head_seq 5 where the clean
    # lifecycle pins 3/3 — only the SERVED state (kind/corpus rows)
    # converges. GEN_CATALOG_ORACLE's seq/retention constants therefore
    # assume the in-process lifecycle with no external head mutation
    # (documented on gen_index_catalog_report); natural crash states
    # (ledger shorter than 3, or head off the build gen without extra
    # commits) do converge to the oracle's 3/3.
    healed = rows(gen_index_catalog_report(spark, crash_dir))
    by_state = {r[0]: r for r in healed}
    want_rb = {r[0]: r for r in want}["rolled_back"]
    rb = by_state["rolled_back"]
    assert rb[2] == "build"  # kind serves the base snapshot again
    assert rb[3] == want_rb[3]  # corpus rows converge to the base count
    assert rb[1] == 5 and rb[4] == 5  # the exact divergence: 2 extra commits
    assert rb[5] == want_rb[5]  # GC horizon unchanged (nothing swept)
    assert by_state["build_only"] == {r[0]: r for r in want}["build_only"]
