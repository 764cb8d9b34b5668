"""Time-series queries over the events table (north-star extension —
resample, gap-fill/interpolate, EWMA smoothing, rolling-zscore anomalies).
See operators/timeseries.py for the scale design of each.

All downstream math consumes the per-(type, hour) ROUNDED mean
(:func:`..operators.timeseries.hourly_buckets`) so every engine recurses
and windows over identical float64 inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.timeseries import (
    ewma,
    gap_fill_interpolate,
    hourly_buckets,
    resample_ohlc,
    rolling_zscore,
)
from pyspark.sql import functions as F

from ..session import tune
from ..sources import read_table

# Exact integer-micro mean (half-up), mirroring operators/timeseries.py
# hourly_buckets — see its docstring for why a float avg+round is not
# cross-engine stable on 2-dp inputs.
_BUCKETS_SQL = """
    SELECT event_type AS series_key,
           date_trunc('hour', ts) AS bucket_ts,
           CAST((2 * sum(CAST(round(value * 100) AS BIGINT)) * 10000
                 + count(value)) // (2 * count(value)) AS DOUBLE) / 1e6
               AS mean_value
    FROM events
    GROUP BY 1, 2
"""


def _buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    return hourly_buckets(ev, "ts", "event_type", "value")


def ts_ohlc_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type; open/close picked by event_id
    (unique, arrival-ordered) so bars are deterministic."""
    tune(spark)
    ev = read_table(spark, sf_dir, "events")
    return resample_ohlc(ev, "ts", "event_type", "value", "event_id")


TS_OHLC_ORACLE = """
SELECT event_type AS series_key,
       date_trunc('hour', ts) AS bucket_ts,
       arg_min(value, event_id) AS open,
       max(value) AS high,
       min(value) AS low,
       arg_max(value, event_id) AS close,
       count(*) AS n_events,
       round(sum(value), 6) AS volume
FROM events
GROUP BY 1, 2
"""


def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly series on the global calendar spine, missing hours
    linearly interpolated between nearest observed neighbors."""
    tune(spark)
    return gap_fill_interpolate(_buckets(spark, sf_dir))


TS_GAP_FILL_ORACLE = f"""
WITH b AS ({_BUCKETS_SQL}),
bounds AS (SELECT min(bucket_ts) AS lo, max(bucket_ts) AS hi FROM b),
spine AS (
    SELECT k.series_key, g.bucket_ts
    FROM (SELECT DISTINCT series_key FROM b) k
    CROSS JOIN (
        SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
        FROM bounds
    ) g
),
j AS (
    SELECT s.series_key, s.bucket_ts, b.mean_value
    FROM spine s LEFT JOIN b USING (series_key, bucket_ts)
),
f AS (
    SELECT *,
        last_value(mean_value IGNORE NULLS) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
        last_value(CASE WHEN mean_value IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_ts,
        first_value(mean_value IGNORE NULLS) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
        first_value(CASE WHEN mean_value IS NOT NULL THEN bucket_ts END IGNORE NULLS) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_ts
    FROM j
)
SELECT series_key, bucket_ts,
       mean_value IS NOT NULL AS observed,
       round(coalesce(
           mean_value,
           CASE WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                ELSE prev_v + (next_v - prev_v) *
                     ((epoch(bucket_ts) - epoch(prev_ts))
                      / (epoch(next_ts) - epoch(prev_ts)))
           END), 6) AS filled_value
FROM f
"""


def ts_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α = 0.2) per event type over the hourly means — the
    sequential-recursion-per-key shape (applyInPandas; the DuckDB oracle
    spells the identical recursion as a recursive CTE)."""
    tune(spark)
    return ewma(_buckets(spark, sf_dir), alpha=0.2)


TS_EWMA_ORACLE = f"""
WITH RECURSIVE b AS (
    SELECT *, row_number() OVER (PARTITION BY series_key ORDER BY bucket_ts) AS rn
    FROM ({_BUCKETS_SQL})
),
r AS (
    SELECT series_key, bucket_ts, mean_value, rn,
           mean_value AS ewma_raw
    FROM b WHERE rn = 1
    UNION ALL
    SELECT b.series_key, b.bucket_ts, b.mean_value, b.rn,
           CAST(0.2 AS DOUBLE) * b.mean_value
               + CAST(0.8 AS DOUBLE) * r.ewma_raw
    FROM b JOIN r ON b.series_key = r.series_key AND b.rn = r.rn + 1
)
SELECT series_key, bucket_ts, mean_value, round(ewma_raw, 6) AS ewma_value
FROM r
"""


def ts_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-bucket z-score anomaly flags per event type."""
    tune(spark)
    return rolling_zscore(_buckets(spark, sf_dir), window_rows=24, z_threshold=2.0)


# Rolling stats from EXACT integer window sums of the 1e6-scaled rounded
# means (floating window aggregates drift cross-engine — see
# operators/timeseries.rolling_zscore); every float op below the sums is
# the same expression Spark evaluates.
TS_ZSCORE_ORACLE = f"""
WITH b AS (
    SELECT *, CAST(round(mean_value * 1e6) AS BIGINT) AS mi
    FROM ({_BUCKETS_SQL})
),
w AS (
    SELECT *,
        sum(mi) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS s,
        sum(mi * mi) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS q,
        count(mi) OVER
            (PARTITION BY series_key ORDER BY bucket_ts
             ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS n
    FROM b
),
x AS (
    SELECT *,
        -- half-up of s/n in exact integer space; round(double,6) ties
        -- are not cross-engine deterministic (see Spark operator)
        floor((2 * s + n) / (2 * n)) AS mean_micro,
        (CAST(s AS DOUBLE) / n) / 1e6 AS mean_raw,
        CASE WHEN n >= 2 THEN
            sqrt(greatest(
                (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
                    / (n - 1),
                0.0)) / 1e6
        END AS std_raw
    FROM w
),
z AS (
    SELECT *,
        CASE WHEN std_raw > 0
             THEN (CAST(mi AS DOUBLE) / 1e6 - mean_raw) / std_raw
        END AS z_raw
    FROM x
)
SELECT series_key, bucket_ts, mean_value,
       CAST(mean_micro AS DOUBLE) / 1e6 AS roll_mean,
       round(std_raw, 6) AS roll_std,
       round(z_raw, 6) AS zscore,
       coalesce(abs(z_raw) > 2.0, FALSE) AS is_anomaly
FROM z
"""


def ts_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-series anomaly gate: flag hourly buckets whose mean sits
    more than 5 median-absolute-deviations from the series median — the
    outlier detector that, unlike the z-score, is not itself dragged by
    the outliers it is hunting.

    Exactness: medians run over the 1e6-scaled INTEGER bucket means (the
    TS_ZSCORE_ORACLE trick), so every median is an integer or an exact
    .5 half, deviations are exact doubles, and the 5·MAD comparison is
    bit-deterministic across engines — no float-boundary flag flips.
    Scale: two tiny per-series aggregates broadcast back onto the bucket
    frame; the bucket aggregation itself is the only corpus-sized shuffle."""
    tune(spark)
    b = _buckets(spark, sf_dir).withColumn(
        "mi", F.round(F.col("mean_value") * 1e6).cast("long")
    )
    meds = b.groupBy("series_key").agg(F.median("mi").alias("med"))
    dev = b.join(F.broadcast(meds), "series_key").withColumn(
        "adev", F.abs(F.col("mi") - F.col("med"))
    )
    mads = dev.groupBy("series_key").agg(F.median("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mads), "series_key")
        .select(
            "series_key",
            "bucket_ts",
            "mean_value",
            F.round(F.col("med") / 1e6, 6).alias("series_median"),
            F.round(F.col("mad") / 1e6, 6).alias("series_mad"),
            (F.col("adev") > 5 * F.col("mad")).alias("flagged"),
        )
    )


TS_ANOMALY_MAD_ORACLE = f"""
WITH b AS (
    SELECT *, CAST(round(mean_value * 1e6) AS BIGINT) AS mi
    FROM ({_BUCKETS_SQL})
),
meds AS (SELECT series_key, median(mi) AS med FROM b GROUP BY 1),
dev AS (
    SELECT b.*, m.med, abs(b.mi - m.med) AS adev
    FROM b JOIN meds m USING (series_key)
),
mads AS (SELECT series_key, median(adev) AS mad FROM dev GROUP BY 1)
SELECT d.series_key, d.bucket_ts, d.mean_value,
       round(d.med / 1e6, 6) AS series_median,
       round(m.mad / 1e6, 6) AS series_mad,
       d.adev > 5 * m.mad AS flagged
FROM dev d JOIN mads m USING (series_key)
"""


REGISTRY = [
    ("ts_ohlc_resample", ts_ohlc_resample, TS_OHLC_ORACLE),
    ("ts_gap_fill_interpolate", ts_gap_fill_interpolate, TS_GAP_FILL_ORACLE),
    ("ts_ewma_hourly", ts_ewma_hourly, TS_EWMA_ORACLE),
    ("ts_rolling_zscore", ts_rolling_zscore, TS_ZSCORE_ORACLE),
    ("ts_anomaly_mad", ts_anomaly_mad, TS_ANOMALY_MAD_ORACLE),
]
