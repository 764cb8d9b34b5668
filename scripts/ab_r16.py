"""Interleaved same-boot A/B harness for the r16 optimization round.

Alternates old/new variants of the queries the r15 driver flagged
(incremental_corpus_dedup, ngram_contamination_check,
multimodal_phash_dedup) plus this round's rewrite candidates inside ONE
JVM, timing each with the noop sink (guide §1.4). Also asserts the
variants are RESULT-IDENTICAL (collected, sorted rows) before timing, so
a faster wrong variant can never look like a win.

Usage: python scripts/ab_r16.py [legs] [variant ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from glue_job_to_write_structured_data_on_s3_full_code_spark import session as S
from glue_job_to_write_structured_data_on_s3_full_code_spark.functions.text import (
    normalized_text,
    tokens,
)
from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import llm_ops3
from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops3 import (
    TRAIN_BUCKET_MAX,
    five_gram_digests,
)
from glue_job_to_write_structured_data_on_s3_full_code_spark.sources import read_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- ngram_contamination_check variants -----------------------------------

def contamination_window(spark, sf_dir):  # the r15 form (current)
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops3 import (
        ngram_contamination_check,
    )

    return ngram_contamination_check(spark, sf_dir)


def contamination_join_r14(spark, sf_dir):  # the pre-r15 two-pass join form
    S.tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    grams = five_gram_digests(
        docs.select("doc_id", bucket.alias("bucket"), "text"), "doc_id", "bucket"
    )
    train_g = (
        grams.where(F.col("bucket") < TRAIN_BUCKET_MAX).select("gh").distinct()
    )
    eval_g = grams.where(F.col("bucket") >= TRAIN_BUCKET_MAX)
    return (
        eval_g.join(train_g.withColumn("hit", F.lit(1)), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("hit").alias("n_contaminated"),
            F.round(F.count("hit") / F.count("*"), 6).alias("contamination"),
        )
        .withColumn("flagged", F.col("contamination") >= 0.5)
    )


def contamination_agg(spark, sf_dir):  # hash-agg + collect_list, no sort
    S.tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    grams = five_gram_digests(
        docs.select("doc_id", bucket.alias("bucket"), "text"), "doc_id", "bucket"
    )
    per_gram = grams.groupBy("gh").agg(
        F.max(
            F.when(F.col("bucket") < TRAIN_BUCKET_MAX, 1).otherwise(0)
        ).alias("hit"),
        F.collect_list(
            F.when(F.col("bucket") >= TRAIN_BUCKET_MAX, F.col("doc_id"))
        ).alias("eval_docs"),
    )
    return (
        per_gram.select("hit", F.explode("eval_docs").alias("doc_id"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum("hit").alias("n_contaminated"),
            F.round(F.sum("hit") / F.count("*"), 6).alias("contamination"),
        )
        .withColumn("flagged", F.col("contamination") >= 0.5)
    )


def contamination_ckpt_join(spark, sf_dir):  # one gram pass + digest join
    S.tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    bucket = F.expr("substring(md5(cast(doc_id as string)), 1, 2)")
    grams = five_gram_digests(
        docs.select("doc_id", bucket.alias("bucket"), "text"), "doc_id", "bucket"
    )
    grams = S.eager_checkpoint(grams, "contamination_grams")
    train_g = (
        grams.where(F.col("bucket") < TRAIN_BUCKET_MAX).select("gh").distinct()
    )
    eval_g = grams.where(F.col("bucket") >= TRAIN_BUCKET_MAX)
    return (
        eval_g.join(train_g.withColumn("hit", F.lit(1)), "gh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(F.coalesce("hit", F.lit(0))).alias("n_contaminated"),
            F.round(
                F.sum(F.coalesce("hit", F.lit(0))) / F.count("*"), 6
            ).alias("contamination"),
        )
        .withColumn("flagged", F.col("contamination") >= 0.5)
    )


# --- incremental_corpus_dedup variants -------------------------------------

def incremental_current(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops6 import (
        incremental_corpus_dedup,
    )

    return incremental_corpus_dedup(spark, sf_dir)


def incremental_ckpt(spark, sf_dir):  # eager_checkpoint(keyed) variant
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans import llm_ops6

    S.tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        F.md5(normalized_text("text")).alias("fp"),
        F.md5(llm_ops6._head_key("text")).alias("head_fp"),
    )
    keyed = S.eager_checkpoint(keyed, "incremental_keyed_digests")
    corpus = keyed.where(F.col("source") != llm_ops6._INCOMING_SOURCE)
    recrawl = corpus.where(
        F.pmod(F.col("doc_id"), F.lit(llm_ops6._RECRAWL_MOD)) == 7
    ).select(
        (F.col("doc_id") + llm_ops6._RECRAWL_ID_OFFSET).alias("doc_id"),
        F.lit(llm_ops6._INCOMING_SOURCE).alias("source"),
        "fp",
        "head_fp",
    )
    incoming = keyed.where(
        F.col("source") == llm_ops6._INCOMING_SOURCE
    ).unionByName(recrawl)
    inc_fp = incoming.select("fp").distinct()
    inc_head = incoming.select("head_fp").distinct()
    corpus_fp = (
        corpus.select("fp")
        .join(inc_fp, "fp", "semi")
        .distinct()
        .withColumn("is_exact", F.lit(True))
    )
    corpus_head = (
        corpus.select("head_fp")
        .join(inc_head, "head_fp", "semi")
        .distinct()
        .withColumn("is_head", F.lit(True))
    )
    return (
        incoming.join(corpus_fp, "fp", "left")
        .join(corpus_head, "head_fp", "left")
        .select(
            "doc_id",
            F.coalesce("is_exact", F.lit(False)).alias("exact_dup"),
            F.coalesce("is_head", F.lit(False)).alias("head_dup"),
            F.when(
                F.coalesce("is_exact", F.lit(False))
                | F.coalesce("is_head", F.lit(False)),
                "drop",
            )
            .otherwise("ingest")
            .alias("verdict"),
        )
    )


# --- multimodal_phash_dedup variants ---------------------------------------

def phash_current(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        multimodal_phash_dedup,
    )

    return multimodal_phash_dedup(spark, sf_dir)


def phash_nospread(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators import (
        multimodal,
    )

    saved = multimodal.spread_small_input
    multimodal.spread_small_input = lambda df: df
    try:
        return phash_current(spark, sf_dir)
    finally:
        multimodal.spread_small_input = saved


# --- simhash_fingerprint variants -------------------------------------------

def simhash_current(spark, sf_dir):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.plans.llm_ops import (
        simhash_fingerprint,
    )

    return simhash_fingerprint(spark, sf_dir)


def simhash_conv(spark, sf_dir, bits: int = 32):
    from glue_job_to_write_structured_data_on_s3_full_code_spark.operators.dedup import (
        _doc_tokens,
    )

    S.tune(spark)
    docs = read_table(spark, sf_dir, "documents")
    doc_tok = (
        _doc_tokens(S.spread_small_input(docs), "text", "doc_id")
        .withColumn("_h", F.md5(F.col("tok")))
        .withColumn("_n1", F.expr("CAST(conv(substring(_h, 1, 15), 16, 10) AS BIGINT)"))
        .withColumn("_n2", F.expr("CAST(conv(substring(_h, 16, 15), 16, 10) AS BIGINT)"))
        .withColumn("_n3", F.expr("CAST(conv(substring(_h, 31, 2), 16, 10) AS BIGINT)"))
    )

    def bit_src(j: int) -> str:
        if j < 15:
            return f"(shiftright(_n1, {4 * (14 - j)}) & 8)"
        if j < 30:
            return f"(shiftright(_n2, {4 * (29 - j)}) & 8)"
        return f"(shiftright(_n3, {4 * (31 - j)}) & 8)"

    aggs = [
        F.expr(f"sum(CASE WHEN {bit_src(j)} != 0 THEN 1 ELSE -1 END)").alias(
            f"s{j}"
        )
        for j in range(bits)
    ]
    sums = doc_tok.groupBy("doc_id").agg(*aggs)
    bit_cols = [
        F.when(F.col(f"s{j}") > 0, "1").otherwise("0") for j in range(bits)
    ]
    return sums.select("doc_id", F.concat(*bit_cols).alias("simhash_bits"))


VARIANTS = {
    "contamination": [
        ("window_r15", contamination_window),
        ("join_r14", contamination_join_r14),
        ("agg_new", contamination_agg),
        ("ckpt_join", contamination_ckpt_join),
    ],
    "incremental": [
        ("current", incremental_current),
        ("ckpt_keyed", incremental_ckpt),
    ],
    "phash": [
        ("spread_r15", phash_current),
        ("nospread", phash_nospread),
    ],
    "simhash": [
        ("substr_isin", simhash_current),
        ("conv_bits", simhash_conv),
    ],
}


def canon(df):
    return sorted(tuple(r) for r in df.collect())


def main() -> None:
    legs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = sys.argv[2:] or list(VARIANTS)
    spark = S.get_spark("ab_r16")

    for qname in names:
        variants = VARIANTS[qname]
        base = canon(variants[0][1](spark, SF_DIR))
        for vname, fn in variants[1:]:
            got = canon(fn(spark, SF_DIR))
            status = "IDENTICAL" if got == base else "** MISMATCH **"
            print(f"[{qname}] {variants[0][0]} vs {vname}: {status}", flush=True)
            if got != base:
                print(f"  base rows={len(base)} got rows={len(got)}")
                for a, b in list(zip(base, got))[:5]:
                    if a != b:
                        print(f"  base {a}\n  got  {b}")

        times: dict[str, list[float]] = {v: [] for v, _ in variants}
        # warm each variant once
        for vname, fn in variants:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        for leg in range(legs):
            for vname, fn in variants:
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                times[vname].append(round(time.perf_counter() - t0, 3))
        for vname, ts in times.items():
            med = sorted(ts)[len(ts) // 2]
            print(f"[{qname}] {vname}: legs={ts} median={med}", flush=True)


if __name__ == "__main__":
    main()
