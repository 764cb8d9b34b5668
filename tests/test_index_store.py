"""Generational (object-store-safe) stored-IVF index: pointer-CAS commit,
manifest-pruned probes, GC-instead-of-repair, multi-writer rebase. The
semantics pin is row-identity with the in-memory `ivf_topk` (the same
oracle the POSIX stored index is held to)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark.operators import index_store as gs
from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.similarity import ivf_topk
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _ptrs(spark, name):
    root = gs._store_root(spark, name)
    return gs.LocalPointerStore(root).pointers()


@pytest.fixture(scope="module")
def gen_shared(spark, sf_dir):
    """One shared build for the read-only core tests (probe identity,
    pointer shape, fingerprint guard) — mutation tests build their own."""
    emb = read_table(spark, sf_dir, "embeddings")
    payload = gs.gen_index_build(emb, index_name="t_gen_shared")
    return emb, payload


def test_gen_build_probe_matches_in_memory_ivf(spark, gen_shared):
    """The generational probe must be row-identical to ivf_topk on the
    same corpus — same centroid rule, assignment tie-breaks, cosine
    rounding, and rank ordering."""
    emb, _payload = gen_shared
    q = emb.where(F.col("vec_id") < 10)
    got = _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_shared"))
    want = _rows(ivf_topk(emb, q, k=5))
    assert got == want and len(got) > 0


def test_gen_commit_is_one_pointer_create(spark, gen_shared):
    """Publishing = exactly one new LATEST.<seq> object; the generation
    itself is immutable and complete before the pointer exists."""
    _emb, payload = gen_shared
    ptrs = _ptrs(spark, "t_gen_shared")
    assert [seq for seq, _ in ptrs] == [1]
    assert ptrs[0][1]["gen"] == payload["gen"]
    root = gs._store_root(spark, "t_gen_shared")
    manifest = gs._read_manifest(root, payload["gen"])
    # every manifest file lives inside the committed generation
    assert all(rel.startswith(payload["gen"] + "/") for files in manifest["cells"].values() for rel in files)


@pytest.mark.slow  # index mutation lifecycle (slow tier)
def test_gen_append_references_parent_files(spark, sf_dir):
    """An append generation holds ONLY the batch's files; untouched
    parent files are REFERENCED by manifest, not copied — the O(|batch|)
    property. Probe afterwards equals ivf_topk on base ∪ batch."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    batch = emb.where(F.col("vec_id") % 50 == 17)
    built = gs.gen_index_build(base, index_name="t_gen_app")
    appended = gs.gen_index_append(batch, index_name="t_gen_app")
    root = gs._store_root(spark, "t_gen_app")
    manifest = gs._read_manifest(root, appended["gen"])
    gens_used = {rel.split("/", 1)[0] for files in manifest["cells"].values() for rel in files}
    assert built["gen"] in gens_used and appended["gen"] in gens_used
    # the append's own directory contains only batch-sized state
    own = [rel for files in manifest["cells"].values() for rel in files if rel.startswith(appended["gen"])]
    n_batch = batch.count()
    got_rows = spark.read.parquet(*[os.path.join(root, rel) for rel in own])
    assert got_rows.count() == n_batch
    q = emb.where(F.col("vec_id") < 10)
    assert _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_app")) == _rows(
        ivf_topk(emb, q, k=5)
    )
    assert gs.gen_index_verify(spark, "t_gen_app")["consistent"]


@pytest.mark.slow  # index mutation lifecycle (slow tier)
def test_gen_idempotency_token_skips_replay(spark, sf_dir):
    """A replayed delivery (same token) must not advance the pointer or
    re-append rows — foreachBatch's at-least-once becomes exactly-once."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    batch = emb.where(F.col("vec_id") % 50 == 17)
    gs.gen_index_build(base, index_name="t_gen_tok")
    first = gs.gen_index_append(batch, index_name="t_gen_tok", idempotency_token="ck:b0")
    n_ptrs = len(_ptrs(spark, "t_gen_tok"))
    replay = gs.gen_index_append(batch, index_name="t_gen_tok", idempotency_token="ck:b0")
    assert replay == first
    assert len(_ptrs(spark, "t_gen_tok")) == n_ptrs
    assert gs.gen_index_verify(spark, "t_gen_tok")["consistent"]


def test_gen_probe_fingerprint_mismatch_raises(spark, gen_shared):
    emb, _payload = gen_shared
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.similarity import (
        _corpus_fingerprint,
    )

    # a subset fingerprint ≠ the indexed full corpus
    wrong = _corpus_fingerprint(emb.where(F.col("vec_id") % 50 != 17), "vec_id")
    with pytest.raises(ValueError, match="does not match the corpus"):
        gs.gen_index_probe(
            emb.where(F.col("vec_id") < 5),
            k=5,
            index_name="t_gen_shared",
            expected_fingerprint=wrong,
        )


@pytest.mark.slow  # index mutation lifecycle (slow tier)
def test_gen_gc_respects_age_horizon(spark, sf_dir):
    """An unpointed generation younger than min_age_s is a possibly-
    staging writer and must survive the sweep; with the horizon at 0 it
    is crash residue and goes."""
    emb = read_table(spark, sf_dir, "embeddings")
    gs.gen_index_build(emb.where(F.col("vec_id") < 500), index_name="t_gen_gc")
    root = gs._store_root(spark, "t_gen_gc")
    orphan = os.path.join(root, "gen-deadbeef")
    os.makedirs(os.path.join(orphan, "cells"))
    with open(os.path.join(orphan, "manifest.json"), "w") as fh:
        json.dump({"cells": {}}, fh)
    kept = gs.gen_index_gc(spark, "t_gen_gc", min_age_s=3600.0)
    assert "gen-deadbeef" in kept["kept_generations"]
    swept = gs.gen_index_gc(spark, "t_gen_gc", min_age_s=0.0)
    assert "gen-deadbeef" in swept["dropped_generations"]
    assert not os.path.exists(orphan)


@pytest.mark.slow  # crash-injection lifecycle test (slow tier)
def test_gen_crash_before_commit_is_invisible_and_gc_sweeps(spark, sf_dir):
    """Kill the writer AFTER its generation is fully staged but BEFORE
    the pointer create: the index serves the old snapshot unchanged
    (there is no publish window to crash inside), verify stays
    consistent, and GC sweeps the orphan generation."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    batch = emb.where(F.col("vec_id") % 50 == 17)
    gs.gen_index_build(base, index_name="t_gen_crash")
    before = _rows(
        gs.gen_index_probe(
            emb.where(F.col("vec_id") < 10), k=5, index_name="t_gen_crash"
        )
    )

    real = gs.LocalPointerStore.try_commit

    def dying(self, seq, payload):
        raise OSError("simulated process kill before pointer create")

    gs.LocalPointerStore.try_commit = dying
    try:
        with pytest.raises(OSError, match="simulated process kill"):
            gs.gen_index_append(batch, index_name="t_gen_crash")
    finally:
        gs.LocalPointerStore.try_commit = real

    # the crash is INVISIBLE to readers: same pointer, same results
    assert len(_ptrs(spark, "t_gen_crash")) == 1
    after = _rows(
        gs.gen_index_probe(
            emb.where(F.col("vec_id") < 10), k=5, index_name="t_gen_crash"
        )
    )
    assert after == before
    assert gs.gen_index_verify(spark, "t_gen_crash")["consistent"]
    report = gs.gen_index_gc(spark, "t_gen_crash", min_age_s=0.0)
    assert len(report["dropped_generations"]) == 1  # the orphan staging gen
    # and the real append still lands afterwards
    gs.gen_index_append(batch, index_name="t_gen_crash")
    q = emb.where(F.col("vec_id") < 10)
    assert _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_crash")) == _rows(
        ivf_topk(emb, q, k=5)
    )


@pytest.mark.slow  # concurrency lifecycle test (slow tier)
def test_gen_concurrent_appends_rebase_not_lost(spark, sf_dir):
    """Two appends racing one index: the loser of the pointer CAS must
    REBASE (recompose its manifest against the winner) and commit at the
    next sequence — both batches land exactly once, no lock anywhere.
    The race is made deterministic by having writer A's first commit
    attempt yield to a full competing append from writer B."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    b_a = emb.where(F.col("vec_id") % 150 == 17)
    b_b = emb.where(F.col("vec_id") % 150 == 67)
    rest = emb.where(F.col("vec_id") % 150 == 117)
    gs.gen_index_build(emb.subtract(b_a).subtract(b_b).subtract(rest), index_name="t_gen_race")
    gs.gen_index_append(rest, index_name="t_gen_race")

    real = gs.LocalPointerStore.try_commit
    state = {"interposed": False}

    def racing(self, seq, payload):
        if not state["interposed"]:
            state["interposed"] = True
            gs.LocalPointerStore.try_commit = real
            try:
                gs.gen_index_append(b_b, index_name="t_gen_race")  # B wins
            finally:
                gs.LocalPointerStore.try_commit = racing
        return real(self, seq, payload)

    gs.LocalPointerStore.try_commit = racing
    try:
        gs.gen_index_append(b_a, index_name="t_gen_race")  # A rebases
    finally:
        gs.LocalPointerStore.try_commit = real

    assert state["interposed"], "the race was never exercised"
    report = gs.gen_index_verify(spark, "t_gen_race")
    assert report["consistent"]
    assert report["actual"]["rows"] == emb.count()
    q = emb.where(F.col("vec_id") < 10)
    assert _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_race")) == _rows(
        ivf_topk(emb, q, k=5)
    )


@pytest.mark.slow  # concurrency lifecycle test (slow tier)
def test_gen_append_restages_when_centroids_move(spark, sf_dir):
    """If a REBUILD with a different centroid set wins the race while an
    append is staged, the staged assignment points at dead cells — the
    append must throw it away and restage against the new centroids,
    never rebase onto them."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    batch = emb.where(F.col("vec_id") % 50 == 17)
    gs.gen_index_build(base, index_name="t_gen_restage", centroid_mod=50)

    real = gs.LocalPointerStore.try_commit
    state = {"interposed": False}

    def rebuilding(self, seq, payload):
        if not state["interposed"]:
            state["interposed"] = True
            gs.LocalPointerStore.try_commit = real
            try:
                # different centroid rule -> different centroid_fp
                gs.gen_index_build(base, index_name="t_gen_restage", centroid_mod=25)
            finally:
                gs.LocalPointerStore.try_commit = rebuilding
        return real(self, seq, payload)

    gs.LocalPointerStore.try_commit = rebuilding
    try:
        gs.gen_index_append(batch, index_name="t_gen_restage")
    finally:
        gs.LocalPointerStore.try_commit = real

    assert state["interposed"]
    report = gs.gen_index_verify(spark, "t_gen_restage")
    assert report["consistent"]
    assert report["actual"]["rows"] == emb.count()
    # and the batch is assigned against the REBUILT (mod=25) centroids:
    # the probe with the same corpus matches the mod=25 in-memory IVF
    q = emb.where(F.col("vec_id") < 10)
    assert _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_restage")) == _rows(
        ivf_topk(emb, q, k=5, centroid_mod=25)
    )


@pytest.mark.slow  # index mutation lifecycle (slow tier)
def test_gen_compact_collapses_history_and_preserves_results(spark, sf_dir):
    """After appends accrete per-batch file sets, compaction rewrites the
    live index into ONE self-contained generation: same fingerprint,
    same probe rows, manifest references a single generation; the
    superseded history is GC-able and the probe still serves after GC."""
    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 50 != 17)
    gs.gen_index_build(base, index_name="t_gen_cpt")
    gs.gen_index_append(
        emb.where(F.col("vec_id") % 150 == 17), index_name="t_gen_cpt"
    )
    gs.gen_index_append(
        emb.where((F.col("vec_id") % 150 == 67) | (F.col("vec_id") % 150 == 117)),
        index_name="t_gen_cpt",
    )
    q = emb.where(F.col("vec_id") < 10)
    before = _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_cpt"))

    compacted = gs.gen_index_compact(spark, "t_gen_cpt")
    root = gs._store_root(spark, "t_gen_cpt")
    manifest = gs._read_manifest(root, compacted["gen"])
    gens_used = {rel.split("/", 1)[0] for files in manifest["cells"].values() for rel in files}
    assert gens_used == {compacted["gen"]}
    assert _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_cpt")) == before
    assert gs.gen_index_verify(spark, "t_gen_cpt")["consistent"]

    report = gs.gen_index_gc(spark, "t_gen_cpt", keep_pointers=1, min_age_s=0.0)
    assert len(report["dropped_generations"]) >= 3  # build + 2 append gens
    assert _rows(gs.gen_index_probe(q, k=5, index_name="t_gen_cpt")) == before
    assert gs.gen_index_verify(spark, "t_gen_cpt")["consistent"]
