"""Reconciliation validation suite — the reference's correctness machinery
promoted to a first-class operator (SURVEY.md §5, OUTBOUND.py:372-457).

Checks, in the reference's order:
1. row-count equality (OUTBOUND.py:380-390)
2. column-name list equality (OUTBOUND.py:394-404)
3. schema equality (OUTBOUND.py:408-418 — printed there, enforced here)
4. full-data equivalence via bidirectional MINUS: ``src MINUS tgt`` and
   ``tgt MINUS src`` must both count 0 (OUTBOUND.py:422-449); we use
   ``exceptAll`` for multiset semantics (SURVEY.md U2).

At scale the two exceptAll checks are one shuffle each on the full row —
acceptable for a validation pass; both sides should already be written/
cached. Failure raises like the reference (OUTBOUND.py:453-457) unless
``raise_on_failure=False``, in which case the summary DataFrame is
returned for inspection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class ReconciliationError(AssertionError):
    pass


def reconcile(
    src: DataFrame, tgt: DataFrame, raise_on_failure: bool = True
) -> DataFrame:
    """Return a one-row summary DataFrame of the four validation checks."""
    spark = src.sparkSession
    src_count = src.count()
    tgt_count = tgt.count()
    cols_match = src.columns == tgt.columns
    schema_match = [f.dataType for f in src.schema.fields] == [
        f.dataType for f in tgt.schema.fields
    ] and cols_match

    if schema_match:
        # gated on SCHEMA match, not just names: exceptAll on same-named
        # but differently-typed columns fails analysis with a raw Spark
        # exception, which would break the raise_on_failure=False
        # "return the summary for inspection" contract
        src_minus_tgt = src.exceptAll(tgt.select(*src.columns)).count()
        tgt_minus_src = tgt.select(*src.columns).exceptAll(src).count()
    else:
        src_minus_tgt = tgt_minus_src = -1

    ok = (
        src_count == tgt_count
        and cols_match
        and schema_match
        and src_minus_tgt == 0
        and tgt_minus_src == 0
    )
    if raise_on_failure and not ok:
        raise ReconciliationError(
            f"reconcile failed: src_count={src_count} tgt_count={tgt_count} "
            f"cols_match={cols_match} schema_match={schema_match} "
            f"src_minus_tgt={src_minus_tgt} tgt_minus_src={tgt_minus_src}"
        )
    return spark.createDataFrame(
        [
            (
                src_count,
                tgt_count,
                bool(cols_match),
                bool(schema_match),
                src_minus_tgt,
                tgt_minus_src,
                bool(ok),
            )
        ],
        "src_count long, tgt_count long, cols_match boolean, schema_match boolean, "
        "src_minus_tgt long, tgt_minus_src long, reconciled boolean",
    )
