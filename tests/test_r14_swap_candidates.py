"""Gate-shaped parity for the two queries REGISTERED in the r14 swap.

Staged here in round 13 while the registry was rotation-saturated (same
rhythm as tests/test_r13_swap_candidates.py), then registered in round 14
paired with two retirements (plans/relational.py RETIRED). The tests
stay: each mirrors the driver's t2 gate exactly (``assert_parity`` = row
count + sorted columns + canonical value multiset vs DuckDB), plus the
crash-recovery and exactly-once-replay properties the gate can't see.

The two candidates complete the generational index's OPERATIONAL story:
rollback-then-serve (the "undo the bad append" lever informed by the
history/diff surface) and streaming maintenance with exactly-once
appends over foreachBatch's at-least-once delivery.
"""

from __future__ import annotations

import pytest

from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # stored-index builds + a streaming run


def test_gen_ivf_rollback_probe_parity(spark, duck, sf_dir):
    """r14 candidate 1: build → append → rollback(1) → probe must serve
    exactly the BASE-corpus IVF results (the appended rows left serving),
    hash-verified against the corpus-restricted oracle — the gate row a
    r14 registration would add."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        gen_ivf_rollback_probe,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        EMBEDDING_IVF_BASE_ORACLE,
    )

    assert_parity(
        gen_ivf_rollback_probe(spark, sf_dir),
        duck,
        EMBEDDING_IVF_BASE_ORACLE,
        "gen_ivf_rollback_probe",
    )


def test_gen_streaming_ivf_maintenance_parity(spark, duck, sf_dir):
    """r14 candidate 2: the generational index maintained by a STREAM
    (foreachBatch → gen_index_append, checkpoint-namespaced idempotency
    tokens) serves the full-corpus IVF results — the same full-fidelity
    oracle the POSIX streaming maintenance row gates."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        gen_streaming_ivf_maintenance,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        EMBEDDING_IVF_ORACLE,
    )

    assert_parity(
        gen_streaming_ivf_maintenance(spark, sf_dir),
        duck,
        EMBEDDING_IVF_ORACLE,
        "gen_streaming_ivf_maintenance",
    )


def test_gen_streaming_replay_is_exactly_once(spark, sf_dir):
    """The at-least-once → exactly-once mechanism itself: after the
    stream completes, re-delivering the FINAL micro-batch with its
    original token (what a crash between append-publish and
    checkpoint-commit produces on restart) is a pointer-level no-op —
    same head sequence, same probe rows."""
    import glue_job_to_write_structured_data_on_s3_full_code_spark.operators.index_store as gs
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        _sf_tag,
        gen_streaming_ivf_maintenance,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.parquet import (
        read_table,
    )
    from pyspark.sql import functions as F

    gen_streaming_ivf_maintenance(spark, sf_dir)  # builds once per session
    name = f"gen_ivf_stream_{_sf_tag(sf_dir)}"
    root = gs._store_root(spark, name)
    ptr = gs._store_for(root)
    head_seq, head = ptr.read_latest()
    assert head["last_token"] is not None and head["last_token"].endswith(
        ":batch-2"
    )

    emb = read_table(spark, sf_dir, "embeddings")
    last_batch = emb.where(F.col("vec_id") % 150 == 117).select(
        "vec_id", "embedding"
    )
    replayed = gs.gen_index_append(
        last_batch, index_name=name, idempotency_token=head["last_token"]
    )
    assert replayed == head  # replay returned the existing head payload
    assert ptr.read_latest()[0] == head_seq  # no new pointer committed


def test_r14_candidates_recover_from_crash_states(spark, sf_dir):
    """Both r14 candidates must converge from the states a crash leaves
    behind (the code-review finding on build-once gating): the rollback
    probe heals a head left on the append snapshot, and the streaming
    maintenance rebuilds + restreams a partial index."""
    import glue_job_to_write_structured_data_on_s3_full_code_spark.operators.index_store as gs
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        _sf_tag,
        gen_ivf_rollback_probe,
        gen_streaming_ivf_maintenance,
    )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    # --- rollback probe: baseline, then simulate "crash after append,
    # before rollback" by re-pointing the head AT the append snapshot
    want = rows(gen_ivf_rollback_probe(spark, sf_dir))
    name = f"gen_ivf_rb_bench_{_sf_tag(sf_dir)}"
    ledger = gs.gen_index_history(spark, index_name=name).collect()
    append_row = next(r for r in ledger if r.kind == "append")
    gs.gen_index_rollback(spark, append_row.seq, index_name=name)
    healed = rows(gen_ivf_rollback_probe(spark, sf_dir))
    assert healed == want
    head = gs.gen_index_history(spark, index_name=name).collect()[-1]
    assert head.gen == ledger[0].gen  # serving the build snapshot again

    # --- streaming maintenance: baseline, then simulate a mid-stream
    # crash by rolling the head back to the base-only build (rows short
    # of the full corpus) — the next invocation must rebuild + restream
    want_s = rows(gen_streaming_ivf_maintenance(spark, sf_dir))
    sname = f"gen_ivf_stream_{_sf_tag(sf_dir)}"
    sledger = gs.gen_index_history(spark, index_name=sname).collect()
    gs.gen_index_rollback(spark, sledger[0].seq, index_name=sname)
    healed_s = rows(gen_streaming_ivf_maintenance(spark, sf_dir))
    assert healed_s == want_s
    shead = gs.gen_index_history(spark, index_name=sname).collect()[-1]
    assert shead.rows == sledger[-1].rows  # full corpus again
    assert shead.gen != sledger[-1].gen  # via a FRESH rebuild+stream
