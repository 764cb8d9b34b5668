"""Pre-validated oracles for the r13 registry swap candidates.

The registry is rotation-saturated and frozen through round 12, so the
five capabilities COVERAGE.md's "Retire-and-swap shortlist" stages for
registration carry their driver-gate-shaped parity checks HERE until
the unfreeze — r13 registration is then a rename (add the entry to a
REGISTRY list + retire a row), not new validation work. Each test
mirrors exactly what the driver's t2 gate would do to the row:
``assert_parity`` for the oracled candidates, the rows-only check for
the xxhash64 family.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # stored-index builds + recall scoreboard


def test_gen_ivf_probe_parity(spark, duck, sf_dir):
    """Swap candidate 1: the generational index's serving path,
    hash-verified against EMBEDDING_IVF_ORACLE — the exact gate row a
    r13 registration would add."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        gen_ivf_probe,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        EMBEDDING_IVF_ORACLE,
    )

    assert_parity(
        gen_ivf_probe(spark, sf_dir), duck, EMBEDDING_IVF_ORACLE, "gen_ivf_probe"
    )


def test_gen_ivf_append_probe_parity(spark, duck, sf_dir):
    """Swap candidate 2: the two-fileset (build + appended batch)
    manifest read path. The appended corpus is the full embeddings
    table and the build's base keeps every vec_id%50==0 centroid, so
    the same oracle applies."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        gen_ivf_append_probe,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        EMBEDDING_IVF_ORACLE,
    )

    assert_parity(
        gen_ivf_append_probe(spark, sf_dir),
        duck,
        EMBEDDING_IVF_ORACLE,
        "gen_ivf_append_probe",
    )


def test_name_pair_candidates_parity_and_recall_contract(spark, duck, sf_dir):
    """Swap candidate 3: the blocked-linkage pair generator. Two pins:
    (a) exact DuckDB parity of the candidate frame (the gate row), and
    (b) the blocking recall CONTRACT — sum(n_pairs) per block equals
    C(rows_in_block, 2) exactly, so no row-level pair escapes."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.linkage import (
        NAME_PAIR_CANDIDATES_ORACLE,
        name_pair_candidates_blocked,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import (
        read_table,
    )

    cand = name_pair_candidates_blocked(spark, sf_dir)
    assert_parity(cand, duck, NAME_PAIR_CANDIDATES_ORACLE, "name_pair_candidates")

    got = {
        r.blk: r.total
        for r in cand.groupBy("blk")
        .agg(F.sum("n_pairs").alias("total"))
        .collect()
    }
    want = {
        r.blk: r.n * (r.n - 1) // 2
        for r in read_table(spark, sf_dir, "part")
        .groupBy(F.col("p_type").alias("blk"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    want = {blk: n for blk, n in want.items() if n > 0}
    assert got == want


def test_minhash_lsh_fast_rows_only_and_pair_set(spark, sf_dir):
    """Swap candidate 4: the xxhash64 production family. xxhash64 has no
    DuckDB equivalent, so its registry row is rows-only — mirror that
    check, then pin the stronger local property: the final verified pair
    set equals the registered md5cw oracle mode's."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        minhash_lsh_dedup,
        minhash_lsh_fast,
    )

    fast = minhash_lsh_fast(spark, sf_dir)
    assert fast.count() >= 0  # the driver's rows-only gate shape
    fast_pairs = {(r.doc_a, r.doc_b) for r in fast.collect()}
    oracle_pairs = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_dedup(spark, sf_dir).collect()
    }
    assert fast_pairs == oracle_pairs


def test_ann_recall_report_fast_parity(spark, duck, sf_dir):
    """Swap candidate 5: the scheduled-audit scoreboard, hash-verified
    against the full recall oracle's CTE composition restricted to the
    same four methods."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        ANN_RECALL_FAST_ORACLE,
        ann_recall_report_fast,
    )

    assert_parity(
        ann_recall_report_fast(spark, sf_dir),
        duck,
        ANN_RECALL_FAST_ORACLE,
        "ann_recall_report_fast",
    )
