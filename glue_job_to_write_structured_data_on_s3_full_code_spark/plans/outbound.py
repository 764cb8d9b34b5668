"""Outbound document job — the reference's OUTBOUND.py re-expressed.

OUTBOUND.py reads the structured table, anti-joins against the serving
store (206-224), restructures flat columns into nested documents — five
``struct()`` groups plus an interests array (239-343) — conditionally
nulls whole structs by prospect type (344-345), writes, and reconciles
(372-457).

Two oracle-backed queries cover the distinctive semantics:

- :func:`nested_document_json` — the document assembly itself. Every field
  is coalesced non-null (the reference's own pattern, FULL.py:661-693)
  which also makes Spark and DuckDB ``to_json`` byte-identical (Spark
  omits null fields; DuckDB emits ``null``).
- :func:`conditional_struct_nullout` — the struct null-out, flattened back
  to columns so the driver hash sees plain values.

:func:`outbound_pipeline` composes the full job (incremental anti-join →
assembly → partitioned write → reconcile) for the end-to-end test.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import anti_join_new_rows, reconcile, top1_per_group
from ..session import eager_checkpoint, tune
from ..sources import read_table


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-shaped input: newest order per customer, dim-enriched."""
    orders = read_table(spark, sf_dir, "orders")
    customer = read_table(spark, sf_dir, "customer")
    nation = read_table(spark, sf_dir, "nation")
    latest = top1_per_group(
        orders,
        ["o_custkey"],
        [F.col("o_orderdate").desc(), F.col("o_orderkey").desc()],
    )
    return (
        latest.join(F.broadcast(customer), latest.o_custkey == customer.c_custkey, "left")
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey, "left")
    )


def _seg() -> F.Column:
    return F.coalesce(F.col("c_mktsegment"), F.lit("NA"))


def _bucket() -> F.Column:
    return (
        F.when(F.col("o_totalprice") < 50000, "LOW")
        .when(F.col("o_totalprice") < 150000, "MEDIUM")
        .otherwise("HIGH")
    )


def _administration() -> F.Column:
    return F.struct(
        F.concat(F.lit("PM"), F.lpad(F.col("o_custkey").cast("string"), 9, "0")).alias("prospectId"),
        F.date_format("o_orderdate", "dd/MM/yyyy").alias("createdDate"),
        F.coalesce(F.col("o_orderstatus"), F.lit("NA")).alias("status"),
    ).alias("administration")


def _customer_details() -> F.Column:
    return F.struct(
        F.coalesce(F.col("c_name"), F.lit("NA")).alias("customerName"),
        _seg().alias("segment"),
        F.coalesce(F.col("n_name"), F.lit("NA")).alias("nationName"),
    ).alias("customerDetails")


def _purchase_details() -> F.Column:
    return F.struct(
        F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("totalPrice"),
        F.coalesce(F.col("o_orderpriority"), F.lit("NA")).alias("priority"),
    ).alias("purchaseDetails")


def _interests() -> F.Column:
    return F.array(
        F.struct(F.lit("QM001").alias("questionId"), _seg().alias("answer")),
        F.struct(F.lit("QM002").alias("questionId"), _bucket().alias("answer")),
    ).alias("interests")


def _document(df: DataFrame) -> DataFrame:
    """OUTBOUND.py:239-343 shape: struct groups + array-of-struct interests
    (FULL.py:659-696 question/response arrays). All leaves coalesced.
    The group builders above are the single definition — the end-to-end
    pipeline composes the same groups plus its scoring extension."""
    return df.select(
        F.col("o_orderkey").alias("leadid"),
        F.struct(
            _administration(),
            _customer_details(),
            _purchase_details(),
            _interests(),
        ).alias("doc"),
    )


def nested_document_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune(spark)
    return _document(_base(spark, sf_dir)).select(
        "leadid", F.to_json("doc").alias("document")
    )


NESTED_DOCUMENT_ORACLE = """
WITH latest AS (
    SELECT * FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
), base AS (
    SELECT l.*, c.c_name, c.c_mktsegment, n.n_name
    FROM latest l
    LEFT JOIN customer c ON l.o_custkey = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
)
SELECT o_orderkey AS leadid,
       to_json(struct_pack(
           administration := struct_pack(
               prospectId := concat('PM', lpad(cast(o_custkey AS VARCHAR), 9, '0')),
               createdDate := strftime(o_orderdate, '%d/%m/%Y'),
               status := coalesce(o_orderstatus, 'NA')
           ),
           customerDetails := struct_pack(
               customerName := coalesce(c_name, 'NA'),
               segment := coalesce(c_mktsegment, 'NA'),
               nationName := coalesce(n_name, 'NA')
           ),
           purchaseDetails := struct_pack(
               totalPrice := coalesce(o_totalprice, 0.0),
               priority := coalesce(o_orderpriority, 'NA')
           ),
           interests := [
               struct_pack(questionId := 'QM001', answer := coalesce(c_mktsegment, 'NA')),
               struct_pack(questionId := 'QM002',
                           answer := CASE WHEN o_totalprice < 50000 THEN 'LOW'
                                          WHEN o_totalprice < 150000 THEN 'MEDIUM'
                                          ELSE 'HIGH' END)
           ]
       )) AS document
FROM base
"""


def conditional_struct_nullout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OUTBOUND.py:344-345: null the whole struct for one prospect type,
    then flatten — unmatched types keep values, nulled types yield NULLs."""
    tune(spark)
    base = _base(spark, sf_dir)
    doc = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.struct(
            F.coalesce(F.col("c_name"), F.lit("NA")).alias("customerName"),
            F.coalesce(F.col("c_mktsegment"), F.lit("NA")).alias("segment"),
            F.coalesce(F.col("o_totalprice"), F.lit(0.0)).alias("totalPrice"),
        )
    )
    return base.select(
        F.col("o_orderkey").alias("leadid"),
        F.col("o_orderstatus").alias("status"),
        doc.alias("doc"),
    ).select(
        "leadid",
        "status",
        F.col("doc.customerName").alias("customer_name"),
        F.col("doc.segment").alias("segment"),
        F.col("doc.totalPrice").alias("total_price"),
    )


CONDITIONAL_NULLOUT_ORACLE = """
WITH latest AS (
    SELECT * FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
), base AS (
    SELECT l.*, c.c_name, c.c_mktsegment
    FROM latest l LEFT JOIN customer c ON l.o_custkey = c.c_custkey
), docs AS (
    SELECT o_orderkey AS leadid, o_orderstatus AS status,
           CASE WHEN o_orderstatus = 'P' THEN NULL
                ELSE struct_pack(
                    customerName := coalesce(c_name, 'NA'),
                    segment := coalesce(c_mktsegment, 'NA'),
                    totalPrice := coalesce(o_totalprice, 0.0)
                ) END AS doc
    FROM base
)
SELECT leadid, status,
       struct_extract(doc, 'customerName') AS customer_name,
       struct_extract(doc, 'segment')      AS segment,
       struct_extract(doc, 'totalPrice')   AS total_price
FROM docs
"""


def outbound_document_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OUTBOUND job end-to-end as ONE registered plan (OUTBOUND.py:
    206-449): serving-store suppression (206-224), five-group document
    assembly (239-343 — administration / customerDetails / purchaseDetails
    / scoring / interests), conditional struct null-out (344-345),
    and the bidirectional reconcile totals (372-457).

    The serving store — leads already exported — is modeled as every order
    placed before 1994-01-01 (deterministic, oracle-expressible). Instead
    of a LEFT ANTI join followed by a second pass to count what it
    dropped, candidates carry a store-hit FLAG through one left join, so
    the reconcile counts (n_candidates = n_suppressed + n_exported, both
    directions of OUTBOUND.py's audit) come from the same single pass that
    produces the export rows: one broadcast-agg join, no recomputation of
    the candidate subtree, no driver collect. The null-out ships flattened
    (Spark omits null struct fields in to_json; DuckDB emits them — the
    same engine asymmetry conditional_struct_nullout documents)."""
    tune(spark)
    base = _base(spark, sf_dir)
    store = (
        read_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") < "1994-01-01")
        .select(F.col("o_orderkey").alias("leadid"), F.lit(1).alias("_hit"))
    )

    # the four shared groups from _document, plus this pipeline's scoring
    # extension — field order matters for to_json, so scoring is spliced
    # between purchaseDetails and interests exactly as the oracle states
    doc = F.struct(
        _administration(),
        _customer_details(),
        _purchase_details(),
        F.struct(
            _bucket().alias("priceBucket"),
            F.year("o_orderdate").alias("orderYear"),
        ).alias("scoring"),
        _interests(),
    )
    nullable_details = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.struct(
            F.coalesce(F.col("c_name"), F.lit("NA")).alias("customerName"),
            _seg().alias("segment"),
        )
    )
    # materialize at the fan-out (reference C1, FULL.py:488): the stats
    # broadcast below executes as its own broadcast-build job, and
    # without this the whole candidates lineage (top-1 window +
    # enrichment joins) would re-run a second time. localCheckpoint
    # rather than cache() so a long-lived embedding session doesn't leak
    # an InMemoryRelation per invocation — checkpoint blocks are freed
    # by the ContextCleaner once the returned frame is GC'd.
    candidates = base.join(store, base.o_orderkey == store.leadid, "left").select(
        F.col("o_orderkey").alias("leadid"),
        F.col("o_orderstatus").alias("status"),
        doc.alias("doc"),
        nullable_details.alias("details"),
        F.coalesce(F.col("_hit"), F.lit(0)).alias("hit"),
    )
    candidates = eager_checkpoint(candidates, "outbound_candidates")
    stats = candidates.agg(
        F.count("*").alias("n_candidates"),
        F.sum("hit").alias("n_suppressed"),
    )
    return (
        candidates.where(F.col("hit") == 0)
        .crossJoin(F.broadcast(stats))
        .select(
            "leadid",
            "status",
            F.col("doc.administration.prospectId").alias("prospect_id"),
            F.to_json("doc").alias("document"),
            F.col("details.customerName").alias("customer_name"),
            F.col("details.segment").alias("segment"),
            "n_candidates",
            "n_suppressed",
            (F.col("n_candidates") - F.col("n_suppressed")).alias("n_exported"),
        )
    )


OUTBOUND_PIPELINE_ORACLE = """
WITH latest AS (
    SELECT * FROM orders
    QUALIFY row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
    ) = 1
), base AS (
    SELECT l.*, c.c_name, c.c_mktsegment, n.n_name
    FROM latest l
    LEFT JOIN customer c ON l.o_custkey = c.c_custkey
    LEFT JOIN nation n   ON c.c_nationkey = n.n_nationkey
), store AS (
    SELECT o_orderkey AS leadid, 1 AS hit
    FROM orders WHERE o_orderdate < DATE '1994-01-01'
), cand AS (
    SELECT b.o_orderkey AS leadid,
           b.o_orderstatus AS status,
           concat('PM', lpad(cast(b.o_custkey AS VARCHAR), 9, '0')) AS prospect_id,
           to_json(struct_pack(
               administration := struct_pack(
                   prospectId := concat('PM', lpad(cast(b.o_custkey AS VARCHAR), 9, '0')),
                   createdDate := strftime(b.o_orderdate, '%d/%m/%Y'),
                   status := coalesce(b.o_orderstatus, 'NA')
               ),
               customerDetails := struct_pack(
                   customerName := coalesce(b.c_name, 'NA'),
                   segment := coalesce(b.c_mktsegment, 'NA'),
                   nationName := coalesce(b.n_name, 'NA')
               ),
               purchaseDetails := struct_pack(
                   totalPrice := coalesce(b.o_totalprice, 0.0),
                   priority := coalesce(b.o_orderpriority, 'NA')
               ),
               scoring := struct_pack(
                   priceBucket := CASE WHEN b.o_totalprice < 50000 THEN 'LOW'
                                       WHEN b.o_totalprice < 150000 THEN 'MEDIUM'
                                       ELSE 'HIGH' END,
                   orderYear := year(b.o_orderdate)
               ),
               interests := [
                   struct_pack(questionId := 'QM001',
                               answer := coalesce(b.c_mktsegment, 'NA')),
                   struct_pack(questionId := 'QM002',
                               answer := CASE WHEN b.o_totalprice < 50000 THEN 'LOW'
                                              WHEN b.o_totalprice < 150000 THEN 'MEDIUM'
                                              ELSE 'HIGH' END)
               ]
           )) AS document,
           CASE WHEN b.o_orderstatus = 'P' THEN NULL
                ELSE coalesce(b.c_name, 'NA') END AS customer_name,
           CASE WHEN b.o_orderstatus = 'P' THEN NULL
                ELSE coalesce(b.c_mktsegment, 'NA') END AS segment,
           coalesce(s.hit, 0) AS hit
    FROM base b LEFT JOIN store s ON b.o_orderkey = s.leadid
), stats AS (
    SELECT count(*) AS n_candidates, CAST(sum(hit) AS BIGINT) AS n_suppressed
    FROM cand
)
SELECT leadid, status, prospect_id, document, customer_name, segment,
       n_candidates, n_suppressed,
       n_candidates - n_suppressed AS n_exported
FROM cand CROSS JOIN stats
WHERE hit = 0
"""


def outbound_pipeline(
    spark: SparkSession,
    sf_dir: str,
    target_path: str,
    job_run_id: str = "run0",
) -> DataFrame:
    """Full OUTBOUND job: incremental anti-join vs what's already in the
    store → document assembly → partitioned parquet write (job_run_id
    partition, OUTBOUND.py:61-65) → bidirectional reconcile of what was
    written. Returns the reconcile summary."""
    tune(spark)
    docs = _document(_base(spark, sf_dir))
    store_path = os.path.join(target_path, "docstore")
    try:
        existing = spark.read.parquet(store_path)
    except Exception:  # first run — empty store
        existing = spark.createDataFrame([], "leadid long")
    new_docs = anti_join_new_rows(docs, existing, "leadid")
    out = new_docs.withColumn("job_run_id", F.lit(job_run_id))
    out.write.mode("append").partitionBy("job_run_id").parquet(store_path)
    written = spark.read.parquet(store_path).where(
        F.col("job_run_id") == job_run_id
    ).drop("job_run_id")
    return reconcile(
        new_docs.select("leadid", "doc.administration.prospectId"),
        written.select("leadid", "doc.administration.prospectId"),
    )


REGISTRY = [
    ("nested_document_json", nested_document_json, NESTED_DOCUMENT_ORACLE),
    ("conditional_struct_nullout", conditional_struct_nullout, CONDITIONAL_NULLOUT_ORACLE),
    ("outbound_document_pipeline", outbound_document_pipeline, OUTBOUND_PIPELINE_ORACLE),
]
