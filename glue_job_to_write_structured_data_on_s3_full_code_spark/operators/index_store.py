"""Generational stored-IVF index — the object-store-safe commit protocol.

The sibling lifecycle in :mod:`.similarity` (build/append/compact/
rebalance/repair) publishes by POSIX rename under an O_EXCL writer lock;
COVERAGE.md's "Filesystem contract" table documents why none of that
transfers to an object store (no atomic rename, no exclusive create on
the data path), and `_require_posix_warehouse` refuses such schemes
loudly. This module is the contract-honest alternative from the same
document's "Object-store commit design", implemented and tested:

- **Immutable generations.** Every mutation writes a COMPLETE new
  generation under a never-reused prefix ``gen-<hex>/`` (cell parquet +
  centroids + manifest). Published data is never renamed, moved, or
  modified — the entire crash-window taxonomy of the POSIX store
  (asides, staged moves, torn fingerprints) has nothing to attach to.
- **Sequenced-pointer commit.** The live generation is named by the
  highest-sequence pointer object ``ptr/LATEST.<seq>``. Commit = create
  the NEXT sequence exactly-once; the create either happens (commit) or
  fails because another writer took the sequence (lose the race, rebase,
  retry). On S3 this is a ``PUT`` with ``If-None-Match: *`` (conditional
  writes, GA since 2024); the local :class:`LocalPointerStore` emulates
  the same create-exactly-once semantics with ``os.link`` — one atomic
  metadata op, so there is NO crash window: crash before the link means
  no commit, crash after means a complete commit. Nothing to repair,
  no lock to break.
- **Manifest-pruned probes.** Each generation's ``manifest.json`` maps
  cell id → parquet file list (an append's manifest REFERENCES the
  parent generation's untouched files, so appends stay O(|batch|)).
  Probes read exactly the probed cells' files — manifest pruning
  replaces directory listing + dynamic partition pruning, which also
  removes the listing-consistency assumption.
- **GC instead of repair.** A crash leaves at worst an unpointed
  generation prefix; :func:`gen_index_gc` deletes whatever no surviving
  pointer's manifest references (behind an age horizon for in-flight
  readers). There are no damage classes to classify.
- **Multi-writer appends.** Losing the pointer race triggers a REBASE:
  the staged generation's manifest is recomposed against the new latest
  (files are immutable, so only the manifest and the XOR-composed
  fingerprint change) and the commit retries at the next sequence. The
  POSIX store's single-writer contract becomes optimistic concurrency.

Semantics (centroid rule, assignment tie-breaks, cosine rounding, rank
ordering) are IDENTICAL to :func:`.similarity.ivf_topk` — pinned by a
row-identity test against :func:`.similarity.ivf_index_probe` over the
same corpus. Reference parity: this serves the same "write structured
data to S3, query it back" north star as the reference's S3 parquet
snapshots (FULL.py:72, JDBC.sql:90); the commit design is the
Iceberg/Delta-style metadata-pointer pattern, public knowledge.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .similarity import (
    _as_double,
    _corpus_fingerprint,
    _dot,
    _ivf_assign,
    _ivf_centroids,
    _ivf_index_path,
)

__all__ = [
    "CommitConflict",
    "LocalPointerStore",
    "gen_index_build",
    "gen_index_append",
    "gen_index_probe",
    "gen_index_verify",
    "gen_index_gc",
    "gen_index_compact",
]


class CommitConflict(RuntimeError):
    """The pointer CAS lost ``max_retries`` races in a row. The staged
    generation was deleted (it is unpointed garbage either way — GC
    would sweep it); retry the mutation. Seeing this at all means many
    writers are racing one index — consider batching their inputs."""


class LocalPointerStore:
    """Create-exactly-once pointer objects on a local filesystem.

    The contract every implementation must honor (and the ONLY
    store-specific primitive the generational index needs):

    - ``read_latest() -> (seq, payload) | (None, None)`` — highest
      sequence wins; a reader never sees a torn payload.
    - ``try_commit(seq, payload) -> bool`` — publish ``payload`` at
      exactly sequence ``seq``; at most ONE concurrent caller per
      sequence returns True. Atomic: a crashed caller either committed
      or didn't.

    Local emulation: payload is written to a private temp file, then
    ``os.link(temp, ptr/LATEST.<seq>)`` — link(2) is one atomic
    metadata op that fails with EEXIST if the sequence is taken, and
    readers only ever see the fully-written inode. An S3 implementation
    is ``PUT ptr/LATEST.<seq>`` with ``If-None-Match: *`` (conditional
    write): same exactly-once create, same atomic-visibility guarantee,
    no lock object anywhere. Listing ``ptr/`` to find the max sequence
    relies on strongly consistent listing, which S3 has provided since
    2020.
    """

    def __init__(self, root: str):
        self._dir = os.path.join(root, "ptr")
        os.makedirs(self._dir, exist_ok=True)

    def _seq_of(self, fname: str) -> int | None:
        if not fname.startswith("LATEST."):
            return None
        try:
            return int(fname.split(".", 1)[1])
        except ValueError:
            return None

    def read_latest(self) -> tuple[int | None, dict | None]:
        best: tuple[int, str] | None = None
        for fname in os.listdir(self._dir):
            seq = self._seq_of(fname)
            if seq is not None and (best is None or seq > best[0]):
                best = (seq, fname)
        if best is None:
            return None, None
        with open(os.path.join(self._dir, best[1])) as fh:
            return best[0], json.load(fh)

    def try_commit(self, seq: int, payload: dict) -> bool:
        tmp = os.path.join(self._dir, f".tmp.{uuid.uuid4().hex}")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        try:
            os.link(tmp, os.path.join(self._dir, f"LATEST.{seq}"))
            return True
        except FileExistsError:
            return False
        finally:
            os.unlink(tmp)

    def pointers(self) -> list[tuple[int, dict]]:
        """All pointers, ascending sequence (GC's reachability input)."""
        out = []
        for fname in sorted(os.listdir(self._dir)):
            seq = self._seq_of(fname)
            if seq is None:
                continue
            with open(os.path.join(self._dir, fname)) as fh:
                out.append((seq, json.load(fh)))
        return sorted(out)

    def drop(self, seq: int) -> None:
        try:
            os.unlink(os.path.join(self._dir, f"LATEST.{seq}"))
        except FileNotFoundError:
            pass


def _store_root(spark: SparkSession, index_name: str) -> str:
    """App-scoped root for a generational index. Reuses the staged-results
    path resolution (and therefore, for THIS local implementation, its
    POSIX check — the LocalPointerStore and the os.walk manifest listing
    are filesystem code). An object-store deployment swaps the pointer
    store and lists freshly-written output through the object API; the
    Spark parquet reads/writes in this module already take URIs as-is."""
    return _ivf_index_path(spark, f"{index_name}_gens")


def _list_cell_files(gen_dir: str, gen_name: str) -> dict[str, list[str]]:
    """cell id -> ROOT-relative parquet paths for one freshly written
    generation. List-after-write of our own unpublished output; strongly
    consistent on local fs and (since 2020) on S3."""
    cells: dict[str, list[str]] = {}
    cells_dir = os.path.join(gen_dir, "cells")
    if not os.path.isdir(cells_dir):
        return cells
    for entry in sorted(os.listdir(cells_dir)):
        if not entry.startswith("cell_id="):
            continue
        cell = entry.split("=", 1)[1]
        files = sorted(
            f"{gen_name}/cells/{entry}/{fname}"
            for fname in os.listdir(os.path.join(cells_dir, entry))
            if fname.endswith(".parquet")
        )
        if files:
            cells[cell] = files
    return cells


def _merge_cells(
    parent: dict[str, list[str]], new: dict[str, list[str]]
) -> dict[str, list[str]]:
    merged = {c: list(fs) for c, fs in parent.items()}
    for c, fs in new.items():
        merged.setdefault(c, []).extend(fs)
    return merged


def _write_manifest(gen_dir: str, manifest: dict) -> None:
    """The manifest lives INSIDE the (still unpublished, writer-private)
    generation dir; overwriting it during an append rebase touches no
    published object."""
    tmp = os.path.join(gen_dir, f".manifest.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, os.path.join(gen_dir, "manifest.json"))


def _read_manifest(root: str, gen_name: str) -> dict:
    with open(os.path.join(root, gen_name, "manifest.json")) as fh:
        return json.load(fh)


def _write_assigned_cells(assigned: DataFrame, gen_dir: str) -> None:
    """Land one generation's cell files. ``cell`` duplicates the
    partition column INTO the rows: probes read manifest-selected FILE
    lists (no directory scan), where Spark does not infer partition
    columns from paths."""
    (
        assigned.withColumn("cell", F.col("cell_id"))
        .write.mode("overwrite")
        .partitionBy("cell_id")
        .parquet(os.path.join(gen_dir, "cells"))
    )


def gen_index_build(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroid_mod: int = 50,
    max_centroids: int = 256,
    index_name: str = "gen_ivf",
) -> dict:
    """Build (or rebuild) a generational IVF index: one assignment pass
    lands a complete generation, then ONE pointer create publishes it.
    Returns the committed pointer payload. A lost race on rebuild means
    someone else just published — the build retries at the next
    sequence with the same (complete, self-contained) generation: a
    rebuild is not composed against a parent, so no rebase is needed.
    The previous append token is carried forward exactly like
    :func:`.similarity.build_ivf_index` (the rebuild-from-full-corpus
    repair flow must keep replay detection armed)."""
    spark = corpus.sparkSession
    root = _store_root(spark, index_name)
    ptr = LocalPointerStore(root)

    cents = _ivf_centroids(corpus, vec_col, id_col, centroid_mod, max_centroids)
    par = spark.sparkContext.defaultParallelism
    assigned = _ivf_assign(
        corpus.repartition(par).select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        ),
        cents,
        "neighbor_id",
        "cv",
        keep=1,
    ).withColumnRenamed("cent_id", "cell_id")

    gen_name = f"gen-{uuid.uuid4().hex}"
    gen_dir = os.path.join(root, gen_name)
    _write_assigned_cells(assigned, gen_dir)
    cents.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(gen_dir, "centroids")
    )
    fp = _corpus_fingerprint(corpus, id_col)
    cent_fp = _corpus_fingerprint(
        spark.read.parquet(os.path.join(gen_dir, "centroids")), "cent_id"
    )
    manifest = {
        "kind": "build",
        "cells": _list_cell_files(gen_dir, gen_name),
        "fingerprint": fp,
        "centroid_fp": cent_fp,
        "centroids": f"{gen_name}/centroids",
    }
    _write_manifest(gen_dir, manifest)

    while True:
        seq, latest = ptr.read_latest()
        payload = {
            "gen": gen_name,
            "fingerprint": fp,
            "centroid_fp": cent_fp,
            "last_token": (latest or {}).get("last_token"),
        }
        if ptr.try_commit((seq or 0) + 1, payload):
            return payload


def gen_index_append(
    batch: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    index_name: str = "gen_ivf",
    idempotency_token: str | int | None = None,
    max_retries: int = 5,
) -> dict:
    """O(|batch|) append with optimistic concurrency. The batch is
    assigned against the latest generation's FROZEN centroids and lands
    as a new generation whose manifest references every untouched parent
    file; commit is one pointer create. Losing the race rebases: the
    manifest is recomposed against the NEW latest and the fingerprint
    re-XORed (immutable files make both pure metadata edits) — unless
    the new latest changed the centroid set (a rebuild/compact won),
    in which case the staged assignment is invalid and the whole append
    restages from scratch. ``idempotency_token`` keeps foreachBatch's
    at-least-once replays exactly-once, same single-token lookback
    contract as the POSIX store; the replay check re-runs inside every
    CAS attempt, so a duplicate delivery that loses a race to its twin
    discards itself instead of double-appending."""
    spark = batch.sparkSession
    root = _store_root(spark, index_name)
    ptr = LocalPointerStore(root)

    for _attempt in range(max_retries):
        seq, latest = ptr.read_latest()
        if latest is None:
            raise FileNotFoundError(
                f"generational index '{index_name}' has no committed "
                "generation — gen_index_build first"
            )
        if (
            idempotency_token is not None
            and latest.get("last_token") == idempotency_token
        ):
            return latest  # duplicate delivery — already applied
        parent_manifest = _read_manifest(root, latest["gen"])
        cents = spark.read.parquet(
            os.path.join(root, parent_manifest["centroids"])
        )
        par = spark.sparkContext.defaultParallelism
        assigned = _ivf_assign(
            batch.repartition(par).select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            ),
            cents,
            "neighbor_id",
            "cv",
            keep=1,
        ).withColumnRenamed("cent_id", "cell_id")

        gen_name = f"gen-{uuid.uuid4().hex}"
        gen_dir = os.path.join(root, gen_name)
        _write_assigned_cells(assigned, gen_dir)
        batch_fp = _corpus_fingerprint(batch, id_col)
        my_cells = _list_cell_files(gen_dir, gen_name)

        # CAS loop: rebase against whoever beats us, restage only if the
        # centroid set moved underneath the staged assignment
        while True:
            seq, latest = ptr.read_latest()
            if (
                idempotency_token is not None
                and latest.get("last_token") == idempotency_token
            ):
                shutil.rmtree(gen_dir)  # twin delivery won the race
                return latest
            if latest["centroid_fp"] != parent_manifest["centroid_fp"]:
                shutil.rmtree(gen_dir)  # assignment is against dead cells
                break  # outer loop restages against the new centroids
            base = _read_manifest(root, latest["gen"])
            fp = {
                "rows": base["fingerprint"]["rows"] + batch_fp["rows"],
                "id_xor": base["fingerprint"]["id_xor"] ^ batch_fp["id_xor"],
            }
            manifest = {
                "kind": "append",
                "cells": _merge_cells(base["cells"], my_cells),
                "fingerprint": fp,
                "centroid_fp": base["centroid_fp"],
                "centroids": base["centroids"],
                "parent": latest["gen"],
            }
            _write_manifest(gen_dir, manifest)
            payload = {
                "gen": gen_name,
                "fingerprint": fp,
                "centroid_fp": base["centroid_fp"],
                "last_token": (
                    idempotency_token
                    if idempotency_token is not None
                    else latest.get("last_token")
                ),
            }
            if ptr.try_commit(seq + 1, payload):
                return payload
            # lost the race: loop — re-read latest, recompose, retry
    raise CommitConflict(
        f"append to '{index_name}' lost {max_retries} commit races "
        "(centroid set kept moving); retry, or serialize structural "
        "maintenance away from append traffic"
    )


def _probe_files(
    spark: SparkSession, root: str, manifest: dict, cells: list[str]
):
    files = [
        os.path.join(root, rel)
        for c in cells
        for rel in manifest["cells"].get(c, [])
    ]
    if not files:
        return None
    return spark.read.parquet(*files)


def gen_index_probe(
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    nprobe: int = 3,
    index_name: str = "gen_ivf",
    expected_fingerprint: dict | None = None,
) -> DataFrame:
    """Serve top-k from the pointed generation. One pointer read pins the
    ENTIRE snapshot (manifest + files are immutable), so a probe can
    never observe a half-published mutation — the reader-exclusion
    caveat the POSIX store documents for rebalance/compact windows does
    not exist here. Reads exactly the probed cells' manifest files.
    Output schema and values are row-identical to
    :func:`.similarity.ivf_index_probe` (pinned by test)."""
    from pyspark.sql import Window

    spark = queries.sparkSession
    root = _store_root(spark, index_name)
    _seq, latest = LocalPointerStore(root).read_latest()
    if latest is None:
        raise FileNotFoundError(
            f"generational index '{index_name}' has no committed generation"
        )
    if expected_fingerprint is not None:
        stored = latest["fingerprint"]
        want = {
            "rows": expected_fingerprint["rows"],
            "id_xor": expected_fingerprint["id_xor"],
        }
        if {"rows": stored["rows"], "id_xor": stored["id_xor"]} != want:
            raise ValueError(
                f"generational index '{index_name}' does not match the "
                f"corpus being queried: index {stored}, corpus {want} — "
                "rebuild or append the missing batch"
            )
    manifest = _read_manifest(root, latest["gen"])
    cents = spark.read.parquet(os.path.join(root, manifest["centroids"]))

    q = _ivf_assign(
        queries.select(
            F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
        ),
        cents,
        "query_id",
        "qv",
        keep=nprobe,
    )
    probed = sorted(
        {str(r["cent_id"]) for r in q.select("cent_id").distinct().collect()}
    )  # bounded: ≤ nprobe × |queries| cell ids, and ≤ max_centroids
    index = _probe_files(spark, root, manifest, probed)
    if index is None:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    scored = (
        index.join(
            F.broadcast(q.withColumnRenamed("cent_id", "cell")), "cell"
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")))
                    * F.sqrt(_dot(F.col("cv"), F.col("cv")))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            F.col("rk").alias("rank"),
        )
    )


def gen_index_verify(spark: SparkSession, index_name: str = "gen_ivf") -> dict:
    """Audit the POINTED generation: every manifest file must exist, and
    the content fingerprint (count + id-hash XOR over the manifest's
    files) must equal the pointer's. There are no orphan/aside damage
    classes — unpointed garbage is GC's department, not an
    inconsistency. Returns {stored, actual, missing_files, consistent}."""
    root = _store_root(spark, index_name)
    _seq, latest = LocalPointerStore(root).read_latest()
    if latest is None:
        raise FileNotFoundError(
            f"generational index '{index_name}' has no committed generation"
        )
    manifest = _read_manifest(root, latest["gen"])
    all_files = [
        rel for files in manifest["cells"].values() for rel in files
    ]
    missing = sorted(
        rel for rel in all_files if not os.path.exists(os.path.join(root, rel))
    )
    if all_files and not missing:
        actual = _corpus_fingerprint(
            spark.read.parquet(*[os.path.join(root, rel) for rel in all_files]),
            "neighbor_id",
        )
    else:
        actual = {"rows": 0, "id_xor": 0}
    stored = {
        "rows": latest["fingerprint"]["rows"],
        "id_xor": latest["fingerprint"]["id_xor"],
    }
    return {
        "stored": stored,
        "actual": actual,
        "missing_files": missing,
        "consistent": not missing and stored == actual,
    }


def gen_index_gc(
    spark: SparkSession,
    index_name: str = "gen_ivf",
    keep_pointers: int = 2,
    min_age_s: float = 3600.0,
) -> dict:
    """Garbage-collect unreachable state: pointer files below the newest
    ``keep_pointers`` sequences, then any generation directory no
    SURVIVING pointer's manifest references (crash residue from a
    writer that died before its commit, or history past the horizon).
    ``min_age_s`` protects two races the pointer protocol itself cannot
    see: a writer that has staged but not yet committed (its generation
    is unpointed ON PURPOSE for a few seconds), and an in-flight reader
    still scanning a just-superseded generation. Returns
    {dropped_pointers, dropped_generations, kept_generations}."""
    import time

    root = _store_root(spark, index_name)
    ptr = LocalPointerStore(root)
    ptrs = ptr.pointers()
    if not ptrs:
        return {"dropped_pointers": [], "dropped_generations": [], "kept_generations": []}
    survivors = ptrs[-keep_pointers:] if keep_pointers > 0 else ptrs[-1:]
    dropped_ptrs = []
    for seq, _payload in ptrs[: len(ptrs) - len(survivors)]:
        ptr.drop(seq)
        dropped_ptrs.append(seq)

    # reachability: every generation named in a surviving manifest's file
    # references (an append generation references its ancestors' files)
    reachable: set[str] = set()
    for _seq, payload in survivors:
        manifest = _read_manifest(root, payload["gen"])
        reachable.add(payload["gen"])
        reachable.add(manifest["centroids"].split("/", 1)[0])
        for files in manifest["cells"].values():
            for rel in files:
                reachable.add(rel.split("/", 1)[0])

    now = time.time()
    dropped_gens, kept = [], []
    for entry in sorted(os.listdir(root)):
        if not entry.startswith("gen-"):
            continue
        if entry in reachable:
            kept.append(entry)
            continue
        gen_dir = os.path.join(root, entry)
        if now - os.path.getmtime(gen_dir) < min_age_s:
            kept.append(entry)  # possibly a staging writer — next sweep
            continue
        shutil.rmtree(gen_dir, ignore_errors=True)
        dropped_gens.append(entry)
    return {
        "dropped_pointers": dropped_ptrs,
        "dropped_generations": dropped_gens,
        "kept_generations": kept,
    }


def gen_index_compact(
    spark: SparkSession,
    index_name: str = "gen_ivf",
    max_retries: int = 5,
) -> dict:
    """Rewrite the live index into ONE self-contained generation (appends
    accrete one file-set per batch per touched cell; probes of a
    long-appended index pay that in file-open overhead). Reads the
    pointed snapshot, writes a full generation carrying the SAME
    centroid set, fingerprint, and token, commits with the same CAS. A
    lost race discards the rewrite and re-reads — compaction of a moved
    index must re-read, not rebase, because its content IS the parent
    snapshot. Old generations become GC-able history."""
    root = _store_root(spark, index_name)
    ptr = LocalPointerStore(root)
    for _attempt in range(max_retries):
        seq, latest = ptr.read_latest()
        if latest is None:
            raise FileNotFoundError(
                f"generational index '{index_name}' has no committed generation"
            )
        manifest = _read_manifest(root, latest["gen"])
        all_files = [
            os.path.join(root, rel)
            for files in manifest["cells"].values()
            for rel in files
        ]
        gen_name = f"gen-{uuid.uuid4().hex}"
        gen_dir = os.path.join(root, gen_name)
        if all_files:
            live = spark.read.parquet(*all_files).select(
                "neighbor_id", "cv", F.col("cell").alias("cell_id")
            )
            _write_assigned_cells(live, gen_dir)
        else:
            os.makedirs(os.path.join(gen_dir, "cells"), exist_ok=True)
        spark.read.parquet(os.path.join(root, manifest["centroids"])).coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(gen_dir, "centroids"))
        new_manifest = {
            "kind": "compact",
            "cells": _list_cell_files(gen_dir, gen_name),
            "fingerprint": manifest["fingerprint"],
            "centroid_fp": manifest["centroid_fp"],
            "centroids": f"{gen_name}/centroids",
            "parent": latest["gen"],
        }
        _write_manifest(gen_dir, new_manifest)
        payload = {
            "gen": gen_name,
            "fingerprint": manifest["fingerprint"],
            "centroid_fp": manifest["centroid_fp"],
            "last_token": latest.get("last_token"),
        }
        if ptr.try_commit(seq + 1, payload):
            return payload
        shutil.rmtree(gen_dir)  # superseded mid-rewrite: re-read and redo
    raise CommitConflict(
        f"compaction of '{index_name}' lost {max_retries} commit races; "
        "schedule it apart from heavy append traffic and retry"
    )
