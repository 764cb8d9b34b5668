"""REST/JSON ingestion — reference operator S5 (SURVEY.md §2.1).

FULL.py:147-183 pulls three master-data APIs driver-side (one call per
``stateCd``, with a retry loop validating the response shape before
accepting it) and builds DataFrames via ``spark.createDataFrame``. That is
the right shape ONLY for small lookup payloads: the fetch is driver-bound.
This module keeps that surface (with the retry/validation semantics) and
adds the scale path — stage records to storage, then ``spark.read.json``
so parsing is distributed.

The HTTP client is injected (``fetcher``) so tests run hermetically and
production can pass ``requests.get`` or anything session-scoped.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession


class RestIngestionError(RuntimeError):
    pass


def fetch_records(
    fetcher: Callable[[str], dict],
    url: str,
    data_key: str = "data",
    max_retries: int = 3,
    validate: Callable[[dict], bool] | None = None,
) -> list[dict]:
    """Fetch one endpoint with the reference's retry-until-valid loop
    (FULL.py:173-181: re-call the API until the payload validates)."""
    last_err: Exception | None = None
    for _ in range(max_retries):
        try:
            payload = fetcher(url)
            if validate is not None and not validate(payload):
                raise RestIngestionError(f"payload failed validation: {url}")
            return payload[data_key]
        except Exception as e:  # noqa: BLE001 — retry any failure mode
            last_err = e
    raise RestIngestionError(f"gave up after {max_retries} tries: {url}") from last_err


def ingest_api(
    spark: SparkSession,
    fetcher: Callable[[str], dict],
    urls: Iterable[str],
    schema: str | None = None,
    data_key: str = "data",
    validate: Callable[[dict], bool] | None = None,
) -> DataFrame:
    """Driver-side ingestion for small lookup APIs (the reference's dealer/
    city/model masters): fetch every URL, union the record lists, one
    createDataFrame. Schema optional — inferred from dicts like FULL.py:156."""
    records: list[dict] = []
    for url in urls:
        records.extend(fetch_records(fetcher, url, data_key, validate=validate))
    if schema is not None:
        return spark.createDataFrame(records, schema)
    if not records:
        # a quiet-day all-empty response is legitimate, but a schema
        # cannot be inferred from zero dicts — createDataFrame([]) would
        # raise a cryptic "can not infer schema"; say what to do instead
        raise RestIngestionError(
            "ingest_api: every endpoint returned zero records and no "
            "schema was given — pass schema= to get an empty DataFrame"
        )
    return spark.createDataFrame(records)


def stage_and_read_json(
    spark: SparkSession,
    records: Iterable[dict],
    stage_dir: str,
    schema: str | None = None,
    records_per_file: int = 50_000,
) -> DataFrame:
    """Scale path: write JSONL to storage, read distributed. At 100 TB the
    fetch tier writes here (S3) and Spark never sees the HTTP layer.

    ``stage_dir`` is cleared first: a re-run staging FEWER files than the
    previous run would otherwise overwrite only a prefix of the old part
    files and silently read the stale remainder back into the result."""
    import shutil

    shutil.rmtree(stage_dir, ignore_errors=True)
    os.makedirs(stage_dir, exist_ok=True)
    buf: list[str] = []
    file_no = 0
    for rec in records:
        buf.append(json.dumps(rec))
        if len(buf) >= records_per_file:
            with open(os.path.join(stage_dir, f"part-{file_no:05d}.json"), "w") as f:
                f.write("\n".join(buf))
            buf, file_no = [], file_no + 1
    if buf:
        with open(os.path.join(stage_dir, f"part-{file_no:05d}.json"), "w") as f:
            f.write("\n".join(buf))
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(stage_dir)
