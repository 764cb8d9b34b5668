"""Time-series operators over event streams (north-star extension; the
reference's only time handling is snapshot filtering + timezone formatting,
FULL.py:210/1346-1348 — no resampling, no interpolation, no smoothing).

Design for scale:

- Resampling is a plain groupBy on (key, bucket) — map-side combined, one
  shuffle, no window.
- Gap filling joins a generated calendar spine (rows = keys × buckets,
  tiny next to the fact) and interpolates with two IGNORE NULLS windows —
  partitioned by key, so no global sort.
- EWMA is inherently sequential per key: it runs as ``applyInPandas`` per
  key over the *bucketed* series (bounded rows per key = buckets, not raw
  events), the classic bounded-state-per-key shape. The recursion uses
  exactly the float expression ``α·x + (1-α)·prev`` so a DuckDB recursive
  CTE spelling the same expression reproduces it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hourly_buckets(
    df: DataFrame, ts_col: str, key_col: str, value_col: str
) -> DataFrame:
    """Per (key, hour) 6-dp mean — the canonical bucketed series the
    smoothing/anomaly operators consume.

    The mean is computed in EXACT integer arithmetic, not as
    ``round(avg(double), 6)``: the fixture values are 2-dp, so the true
    bucket mean (sum_cents / (100·n)) can land EXACTLY on a 6-dp
    half-point, where a float avg differs by ±1 ulp between engines
    (summation order) and the round flips — 1-2 buckets per series at
    sf0.1, invisible at sf0.01. Summing cents as BIGINT and doing the
    half-up division in integer space ((2·s·10⁴ + n) DIV (2·n), values
    non-negative) makes ``mean_value`` the bit-identical double in every
    engine, which the downstream recursions then share."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    return (
        df.groupBy(
            F.col(key_col).alias("series_key"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(F.sum(cents).alias("__s"), F.count(value_col).alias("__n"))
        .select(
            "series_key",
            "bucket_ts",
            (
                F.expr("(2 * __s * 10000 + __n) DIV (2 * __n)").cast("double")
                / 1e6
            ).alias("mean_value"),
        )
    )


def resample_ohlc(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    order_col: str,
) -> DataFrame:
    """OHLC resample to hourly bars per key: open/close are the values at
    the min/max ``order_col`` in the bucket (``min_by``/``max_by`` — one
    groupBy, map-side combined; ``order_col`` must be unique per row, e.g.
    an event id, so the bars are deterministic)."""
    return (
        df.groupBy(
            F.col(key_col).alias("series_key"),
            F.date_trunc("hour", F.col(ts_col)).alias("bucket_ts"),
        )
        .agg(
            F.min_by(value_col, order_col).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, order_col).alias("close"),
            F.count("*").alias("n_events"),
            F.round(F.sum(value_col), 6).alias("volume"),
        )
    )


def gap_fill_interpolate(
    bucketed: DataFrame,
    bucket_interval: str = "1 hour",
) -> DataFrame:
    """Fill missing buckets on a per-key calendar spine and linearly
    interpolate the value between the nearest observed neighbors
    (carry-forward/backward at the edges).

    Input must be the :func:`hourly_buckets` shape
    (``series_key, bucket_ts, mean_value``). The spine spans the GLOBAL
    min..max bucket so every key covers the same range (the broadcast
    scalar min/max is one tiny job); interpolation weights use epoch
    seconds so the math is the same expression in any engine.
    """
    from pyspark.sql import Window

    spark = bucketed.sparkSession
    bounds = bucketed.agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    spine = (
        bucketed.select("series_key")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "series_key",
            F.explode(
                F.sequence("lo", "hi", F.expr(f"INTERVAL {bucket_interval}"))
            ).alias("bucket_ts"),
        )
    )
    j = spine.join(bucketed, ["series_key", "bucket_ts"], "left")
    w_prev = (
        Window.partitionBy("series_key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy("series_key")
        .orderBy("bucket_ts")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_ts = F.when(F.col("mean_value").isNotNull(), F.col("bucket_ts"))
    t = F.unix_timestamp("bucket_ts").cast("double")
    pt = F.unix_timestamp("prev_ts").cast("double")
    nt = F.unix_timestamp("next_ts").cast("double")
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        (t - pt) / (nt - pt)
    )
    return (
        j.withColumn("prev_v", F.last("mean_value", ignorenulls=True).over(w_prev))
        .withColumn("prev_ts", F.last(obs_ts, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.first("mean_value", ignorenulls=True).over(w_next))
        .withColumn("next_ts", F.first(obs_ts, ignorenulls=True).over(w_next))
        .select(
            "series_key",
            "bucket_ts",
            F.col("mean_value").isNotNull().alias("observed"),
            F.round(
                F.coalesce(
                    "mean_value",
                    F.when(F.col("prev_v").isNull(), F.col("next_v"))
                    .when(F.col("next_v").isNull(), F.col("prev_v"))
                    .otherwise(interp),
                ),
                6,
            ).alias("filled_value"),
        )
    )


def ewma(
    bucketed: DataFrame,
    alpha: float = 0.2,
) -> DataFrame:
    """Exponentially weighted moving average per key over the bucketed
    series: ``e_0 = x_0``, ``e_t = α·x_t + (1-α)·e_{t-1}``.

    Sequential per key → ``applyInPandas`` over (key)-grouped, bucket-
    sorted rows. State is one float per key; rows per key are bucket
    counts, not raw events, so a group always fits a task. The loop spells
    the recursion exactly as the SQL oracle does (same binary-op order),
    the running value is never rounded inside the recursion, and the
    output rounding happens as a JVM expression AFTER the UDF — so
    float64 results are bit-identical across engines.
    """
    import pandas as pd

    a = float(alpha)
    b = 1.0 - a

    def smooth(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("bucket_ts").reset_index(drop=True)
        out = []
        e = None
        for v in pdf["mean_value"].to_list():
            e = v if e is None else a * v + b * e
            out.append(e)
        return pd.DataFrame(
            {
                "series_key": pdf["series_key"],
                "bucket_ts": pdf["bucket_ts"],
                "mean_value": pdf["mean_value"],
                "ewma_raw": out,
            }
        )

    smoothed = bucketed.groupBy("series_key").applyInPandas(
        smooth,
        "series_key string, bucket_ts timestamp, mean_value double, ewma_raw double",
    )
    return smoothed.select(
        "series_key",
        "bucket_ts",
        "mean_value",
        F.round("ewma_raw", 6).alias("ewma_value"),
    )


def rolling_zscore(
    bucketed: DataFrame,
    window_rows: int = 24,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Trailing-window z-score anomaly flags over the bucketed series:
    mean/sample-stddev over the last ``window_rows`` observed buckets per
    key (ROWS frame — partitioned window, no global sort).

    Cross-engine determinism: floating window aggregates are NOT
    reproducible across engines (DuckDB's segment-tree sliding sum adds
    in a different order than Spark's frame scan — measured half-ulp
    drift that flips the 6th rounded digit). So the rolling stats are
    computed from EXACT integer window sums of the 1e6-scaled (already
    6-digit-rounded) input, and every float op after the integer sums is
    the same expression in both engines → identical doubles.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("series_key")
        .orderBy("bucket_ts")
        .rowsBetween(-(window_rows - 1), 0)
    )
    mi = F.round(F.col("mean_value") * 1e6).cast("long")
    d = bucketed.withColumn("mi", mi)
    s = F.sum("mi").over(w)
    q = F.sum(F.col("mi") * F.col("mi")).over(w)
    n = F.count("mi").over(w)
    # the ROUNDED mean is derived in exact integer space — floor((2s+n)/2n)
    # is half-up of s/n in micro-units. round(double, 6) itself is NOT
    # cross-engine deterministic on exact .5 ties (Spark rounds the
    # shortest decimal repr, DuckDB the binary value), and s/n with even n
    # produces exactly such ties.
    mean_micro = F.floor(
        (F.lit(2) * s + n) / (F.lit(2) * n)
    )
    mean_raw = (s.cast("double") / n) / F.lit(1e6)
    var_raw = (
        q.cast("double") - s.cast("double") * s.cast("double") / n
    ) / (n - F.lit(1))
    std_raw = F.when(
        n >= 2, F.sqrt(F.greatest(var_raw, F.lit(0.0))) / F.lit(1e6)
    )
    z = F.when(std_raw > 0, (F.col("mi").cast("double") / F.lit(1e6) - mean_raw) / std_raw)
    return d.select(
        "series_key",
        "bucket_ts",
        "mean_value",
        (mean_micro.cast("double") / F.lit(1e6)).alias("roll_mean"),
        F.round(std_raw, 6).alias("roll_std"),
        F.round(z, 6).alias("zscore"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )
