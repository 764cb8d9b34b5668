"""Incremental (anti-join) load — reference operator J8 (SURVEY.md §2.4).

OUTBOUND.py:206-224 inserts only rows whose ``leadid`` is absent from the
target store: ``where leadid not in (select coalesce(leadid,'') from
docdb)``. The ``coalesce`` defuses NOT-IN NULL semantics (one NULL in the
subquery would otherwise empty the result — SURVEY.md §7 hard parts). The
schema-dependent branch (``if 'leadid' in df.columns``) handles the
empty-target first run.

Spark-first translation: ``left_anti`` join, which plans as a broadcast
anti join when the "already loaded" key set is small, and shuffles only the
key column otherwise — never the full payload. NULL-keyed target rows are
dropped from the anti side first, matching the reference's coalesce guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_new_rows(src: DataFrame, target: DataFrame, key: str) -> DataFrame:
    """Rows of ``src`` whose ``key`` does not yet exist in ``target``.

    Handles the empty/first-run target (key column missing) like
    OUTBOUND.py:206: everything is new.

    NULL-keyed SOURCE rows are dropped, matching the reference's NOT-IN
    (``NULL NOT IN (…)`` is NULL → filtered). A bare left_anti would
    instead treat them as always-new — NULL never equals NULL, so every
    incremental run would re-insert the same NULL-keyed rows, silently
    accumulating duplicates and breaking the replay idempotence the
    streaming loader builds on this function.
    """
    src = src.where(F.col(key).isNotNull())
    if key not in target.columns:
        return src
    existing = target.select(key).where(F.col(key).isNotNull()).distinct()
    return src.join(existing, on=key, how="left_anti")
