"""Multimodal (binary payload) columns — SURVEY.md §7 M5 / task brief.

Media assets are opaque ``binary`` columns with typed metadata. The
Spark-side plumbing is real and tested: Arrow-batched ``mapInPandas``
with an explicit output schema, payload-size–aware batching, and
deterministic feature extraction. The actual image/audio decode is a
clearly-marked stub (the sandbox has no codec libraries): plug a real
decoder into :func:`decode_media` and every downstream stage keeps
working.

Scale notes: payloads never pass through Python row-at-a-time — Arrow
moves whole batches; ``spark.sql.execution.arrow.maxRecordsPerBatch``
bounds batch memory when payloads are large (set it so batch ≈ tens of
MB). The feature extractor emits fixed-width vectors, so the output
parquet is columnar-friendly and join-able with the embeddings path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, digest string, fake_width int, fake_height int, "
    "features array<double>"
)


def decode_media(payload: bytes) -> object:
    """STUB — real deployments plug PIL/ffmpeg/soundfile here.

    Kept separate so the Spark plumbing (schema, batching, partitioning)
    is testable without codec libraries in the container.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; extract_media_features uses the deterministic fake "
        "extractor instead"
    )


def _fake_extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic fake decode: metadata + md5-derived 8-dim features.

    Every value is a pure function of the payload bytes, so the DuckDB
    oracle can replay it — the Arrow/mapInPandas plumbing under test is
    exactly what a real decoder would ride.
    """
    import hashlib

    for pdf in batches:
        # NULL payload == empty payload, the same convention
        # perceptual_hash documents — a bare len(None)/md5(None) would
        # abort the whole job from inside the Arrow worker
        payload = pdf["payload"].map(lambda b: b if b is not None else b"")
        n = payload.map(len)
        digest = payload.map(lambda b: hashlib.md5(b).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "digest": digest,
                "fake_width": (n % 640).astype("int32"),
                "fake_height": ((n * 7) % 480).astype("int32"),
                "features": digest.map(
                    lambda h: [int(h[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(8)]
                ),
            }
        )


def extract_media_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched feature extraction over opaque binary payloads."""
    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_fake_extract, schema=MEDIA_FEATURE_SCHEMA)


RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Resize plumbing: 1 row in → 1 row out with a new fixed-size payload.

    The fake "resample" tiles the source bytes to exactly width×height
    bytes (deterministic, pure function of input) — a real implementation
    decodes via :func:`decode_media`, resamples, re-encodes. Batch shape,
    schema, and memory profile (output size independent of input size)
    match the real thing.
    """

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def tile(b: bytes) -> bytes:
            if b is None or len(b) == 0:  # NULL payload == empty
                return bytes(target)
            reps = target // len(b) + 1
            return (b * reps)[:target]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": width,
                    "height": height,
                    "payload": pdf["payload"].map(tile),
                }
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, frame binary"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_nth: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Frame-sampling plumbing: 1 row in → N rows out (exploding fan-out
    inside mapInPandas, the shape a video decoder produces).

    The fake "container" treats the payload as consecutive
    ``frame_bytes``-byte frames and keeps every ``every_nth`` one. A real
    implementation seeks keyframes via the codec; partitioning, fan-out,
    and schema are identical.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL payload == empty
                    payload = b""
                n_frames = max(1, len(payload) // frame_bytes)
                for i in range(0, n_frames, every_nth):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(payload[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_frames, schema=FRAME_SCHEMA)


PHASH_SCHEMA = "doc_id long, phash long"


def perceptual_hash(
    df: DataFrame,
    grid: int = 32,
    block: int = 4,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """REAL (non-stub) numpy-only perceptual hash — mean-threshold aHash
    over the raw byte grid, no codec needed: the payload is tiled
    cyclically to ``grid²`` bytes (the same fake resample
    :func:`resize_media` uses, so the hash reflects CONTENT, not payload
    length) forming a ``grid×grid`` image, block-mean downsampled to
    ``(grid/block)²`` cells; cell bit = 1 iff the cell mean exceeds the
    global mean. All-integer compare
    (``cell_sum · (grid/block)² > total_sum``), so the hash is
    bit-reproducible across engines — this Pandas-UDF operator is
    hash-verified against a DuckDB oracle despite running in Python.

    The hash is emitted as one BIGINT (cell 0 = most-significant bit,
    two's-complement), not a 64-char bit string: at 100 TB the hash is
    the only thing shuffled and grouped on, and an 8-byte key beats a
    64+-byte string for every exchange and hash table downstream. Per
    batch, the grid fill walks rows in Python (unavoidable for ragged
    binary payloads; NULL and empty payloads hash to 0), but block-sum,
    threshold, and the ``np.packbits`` bit-pack are whole-batch
    vectorized numpy. A real image deployment swaps the byte grid for
    :func:`decode_media` output; the batching, schema, and integer
    thresholding carry over unchanged.
    """
    import numpy as np

    if grid % block:
        raise ValueError("grid must be divisible by block")
    cells = grid // block
    if cells * cells > 64:
        raise ValueError(
            "perceptual_hash packs (grid/block)² cells into one 64-bit "
            f"word; {cells * cells} cells do not fit — raise `block`"
        )

    def _phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            img = np.zeros((n, grid * grid), dtype=np.int64)
            for row, payload in enumerate(pdf["payload"]):
                if payload is None:
                    continue  # NULL payload == empty: all-zero hash
                b = np.frombuffer(bytes(payload), dtype=np.uint8)
                if len(b):
                    img[row] = np.resize(b, grid * grid)  # cyclic tile
            blocks = (
                img.reshape(n, cells, block, cells, block)
                .sum(axis=(2, 4))
                .reshape(n, cells * cells)
            )
            total = img.sum(axis=1, keepdims=True)
            bits = blocks * (cells * cells) > total
            if cells * cells < 64:  # low-order zero padding to one word
                bits = np.pad(bits, ((0, 0), (0, 64 - cells * cells)))
            # pack 64 bool cells → one signed 64-bit word (cell 0 = MSB);
            # '>i8' view of the MSB-first packed bytes IS the two's-
            # complement value, no overflow-prone arithmetic
            # astype: big-endian view → native-order int64 (value-preserving
            # byteswap; Arrow rejects non-native byte order)
            packed = np.packbits(bits, axis=1).view(">i8").ravel().astype(np.int64)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "phash": packed})

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_phash, schema=PHASH_SCHEMA)


AUDIO_ENERGY_SCHEMA = "doc_id long, frame_idx int, n_samples int, rms double"


def audio_frame_energy(
    df: DataFrame,
    frame_samples: int = 64,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Audio-style frame energy: the payload is interpreted as unsigned
    8-bit PCM, framed into ``frame_samples``-sample windows, and each
    frame reports its RMS energy around the 128 midpoint — the
    silence-detection / VAD-precursor shape. A real implementation decodes
    via :func:`decode_media` first; the framing, fan-out, and vectorized
    per-frame reduction are exactly what the real thing rides.

    Exactness note: samples are integers, so the squared-sum fits a
    double EXACTLY (no accumulation-order noise) and frame RMS is
    bit-identical across engines — which is why this Pandas-UDF operator
    can still be hash-verified against the DuckDB oracle. Payloads
    shorter than one frame yield a single partial frame; empty payloads
    yield one silent frame (rms 0, 0 samples).
    """
    import numpy as np

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, rms = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:  # NULL payload == empty
                    payload = b""
                a = np.frombuffer(bytes(payload), dtype=np.uint8).astype(
                    np.float64
                ) - 128.0
                if len(a) == 0:
                    ids.append(doc_id); idxs.append(0); ns.append(0); rms.append(0.0)
                    continue
                n_frames = max(1, len(a) // frame_samples)
                for j in range(n_frames):
                    seg = a[j * frame_samples : (j + 1) * frame_samples]
                    ids.append(doc_id)
                    idxs.append(j)
                    ns.append(len(seg))
                    rms.append(float(np.sqrt((seg * seg).sum() / len(seg))))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_samples": ns, "rms": rms}
            )

    src = df.select(F.col(id_col).alias("doc_id"), F.col(payload_col).alias("payload"))
    return src.mapInPandas(_energy, schema=AUDIO_ENERGY_SCHEMA)
