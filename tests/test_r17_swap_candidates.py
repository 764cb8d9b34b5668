"""Pre-validated oracles for the r17 registry swap candidates.

Same staging rhythm as rounds 12→13 through 15→16: the registry is
rotation-saturated at 200 rows, so new capabilities carry
driver-gate-shaped parity checks HERE until a swap frees slots —
registration then is a REGISTRY-entry edit plus a retirement, zero new
validation work. Each test mirrors the driver's t2 gate exactly
(``assert_parity`` = row count + sorted columns + canonical value
multiset vs DuckDB).

``multimodal_interlaced_stats`` drives the round-15 Adam7 decode path
(the last PNG layout the decoder grew) through a DuckDB hash on every
corpus row: the interlaced layout re-orders the physical bytes but not
the pixels, so the BASELINE row's ``IMAGE_STATS_ORACLE`` gates it
unchanged — a mis-scattered pass pixel moves ``px_sum`` and breaks the
hash.

``gen_gc_horizon_report`` gates the GC end of the generational commit
protocol: a build → append → rollback lifecycle swept down to one
pointer (two ``min_age_s=0`` sweeps — generation deletion is leased a
sweep behind pointer deletion), with the post-GC invariants pinned by
``GEN_GC_ORACLE`` and the physical reclamation + post-GC serving pinned
here.
"""

from __future__ import annotations

import pytest

from tests.parity import assert_parity

pytestmark = pytest.mark.slow  # a PNG per document, encoded twice over


def test_multimodal_interlaced_stats_parity(spark, duck, sf_dir):
    """r17 candidate 1: Adam7 encode → native de-interleave decode →
    exact integer stats, hash-verified against the SAME oracle as the
    baseline layout — the gate row a r17 registration would add."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        IMAGE_STATS_ORACLE,
        multimodal_interlaced_stats,
    )

    assert_parity(
        multimodal_interlaced_stats(spark, sf_dir),
        duck,
        IMAGE_STATS_ORACLE,
        "multimodal_interlaced_stats",
    )


def test_interlaced_payloads_actually_differ():
    """The candidate must not silently degrade to the baseline path:
    for any payload wider than one pass, the Adam7 encoding is
    byte-different from the sequential one while decoding to identical
    pixels."""
    import numpy as np

    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.multimodal import (
        decode_media,
        encode_png_grey,
    )

    data = bytes(range(256))
    flat = encode_png_grey(data, 16, 16)
    adam = encode_png_grey(data, 16, 16, interlace=1)
    assert flat != adam
    a, b = decode_media(flat), decode_media(adam)
    assert np.array_equal(a["pixels"], b["pixels"])


def test_gen_gc_horizon_report_parity(spark, duck, sf_dir):
    """r17 candidate 2: the post-GC protocol invariants, hash-verified
    — the gate row a r17 registration would add."""
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        GEN_GC_ORACLE,
        gen_gc_horizon_report,
    )

    assert_parity(
        gen_gc_horizon_report(spark, sf_dir),
        duck,
        GEN_GC_ORACLE,
        "gen_gc_horizon_report",
    )


def test_gen_gc_reclaims_disk_and_still_serves(spark, sf_dir):
    """What the oracle row cannot see, pinned here: after convergence
    exactly ONE pointer file and ONE generation directory remain on
    disk (the append generation was physically reclaimed by the second
    sweep), and the swept index still SERVES — probe rows identical to
    a fresh build over the same base corpus."""
    import os

    from pyspark.sql import functions as F

    import glue_job_to_write_structured_data_on_s3_full_code_spark.operators.index_store as gs
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        _sf_tag,
        gen_gc_horizon_report,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.parquet import (
        read_table,
    )

    first = sorted(tuple(r) for r in gen_gc_horizon_report(spark, sf_dir).collect())
    second = sorted(tuple(r) for r in gen_gc_horizon_report(spark, sf_dir).collect())
    # the dispatch must read the converged single-pointer state as DONE
    # (its ledger kind is 'build' — the rollback head points at the build
    # generation), not as a fresh build to re-run the lifecycle on
    assert first == second
    idx = f"gen_gc_{_sf_tag(sf_dir)}"
    root = gs._store_root(spark, idx)
    gens = [e for e in os.listdir(root) if e.startswith("gen-")]
    assert len(gens) == 1, f"expected one surviving generation, found {gens}"
    ptrs = gs._store_for(root, None).pointers()
    assert [seq for seq, _ in ptrs] == [3]

    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    baseline = f"gc_serve_base_{_sf_tag(sf_dir)}"
    if not gs.gen_index_built(spark, baseline):
        gs.gen_index_build(base, index_name=baseline)
    q = emb.where(F.col("vec_id") < 10)

    def rows(name):
        return sorted(
            tuple(r)
            for r in gs.gen_index_probe(q, k=5, nprobe=3, index_name=name).collect()
        )

    got, want = rows(idx), rows(baseline)
    assert got and got == want


def test_gen_gc_report_converges_from_crash_states(spark, sf_dir, tmp_path):
    """Every interruption point converges to the same report: a crash
    after the append (no rollback yet) and a crash after the FIRST GC
    sweep (pointers trimmed, append generation still leased) both heal
    to the pinned 3/1/3 invariants. Each state runs against its own
    symlink-tagged sf_dir so the mutations land on dedicated indexes."""
    import os

    from pyspark.sql import functions as F

    import glue_job_to_write_structured_data_on_s3_full_code_spark.operators.index_store as gs
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.gen_serving import (
        _sf_tag,
        gen_gc_horizon_report,
    )
    from glue_job_to_write_structured_data_on_s3_full_code_spark.sources.parquet import (
        read_table,
    )

    def report_rows(d):
        return sorted(tuple(r) for r in gen_gc_horizon_report(spark, d).collect())

    clean_dir = str(tmp_path / "sf_gc_clean")
    os.symlink(os.path.abspath(sf_dir), clean_dir)
    want = report_rows(clean_dir)

    # crash state 1: append committed, rollback never ran
    crash1 = str(tmp_path / "sf_gc_crash1")
    os.symlink(os.path.abspath(sf_dir), crash1)
    emb = read_table(spark, crash1, "embeddings")
    idx1 = f"gen_gc_{_sf_tag(crash1)}"
    gs.gen_index_build(
        emb.where(F.col("vec_id") % 50 != 17), index_name=idx1
    )
    gs.gen_index_append(
        emb.where(F.col("vec_id") % 50 == 17),
        index_name=idx1,
        idempotency_token="gc_probe:a0",
    )
    assert report_rows(crash1) == want

    # crash state 2: full lifecycle, but only the FIRST sweep ran —
    # pointers already trimmed, the append generation still leased
    crash2 = str(tmp_path / "sf_gc_crash2")
    os.symlink(os.path.abspath(sf_dir), crash2)
    emb2 = read_table(spark, crash2, "embeddings")
    idx2 = f"gen_gc_{_sf_tag(crash2)}"
    gs.gen_index_build(
        emb2.where(F.col("vec_id") % 50 != 17), index_name=idx2
    )
    gs.gen_index_append(
        emb2.where(F.col("vec_id") % 50 == 17),
        index_name=idx2,
        idempotency_token="gc_probe:a0",
    )
    ledger = gs.gen_index_history(spark, index_name=idx2).collect()
    base_seq = [r.seq for r in ledger if r.kind == "build"][0]
    gs.gen_index_rollback(spark, base_seq, index_name=idx2)
    gs.gen_index_gc(spark, index_name=idx2, keep_pointers=1, min_age_s=0.0)
    root2 = gs._store_root(spark, idx2)
    # the lease: the first sweep must NOT have reclaimed the append gen
    assert len([e for e in os.listdir(root2) if e.startswith("gen-")]) == 2
    assert report_rows(crash2) == want
    assert len([e for e in os.listdir(root2) if e.startswith("gen-")]) == 1
