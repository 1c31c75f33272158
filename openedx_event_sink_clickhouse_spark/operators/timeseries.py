"""Time-series regularization over the event log: gap-filled resampling
and rolling features — the step between raw events and any
forecasting/monitoring consumer (a missing hour must be an explicit
zero row, or every downstream rolling window silently skips it).

Scale posture: the calendar spine is generated PER KEY from that key's
own [min, max] bounds with ``sequence()`` — pure Column expressions, no
driver-side date loop, no cross join against a global calendar (a key
active for a day doesn't pay for the corpus's full year). Spine size is
keys × their active range, the output's own size; the observed
aggregate joins it by (key, bucket) and AQE broadcasts whichever side
is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(events: DataFrame, key_col: str = "event_type",
                     ts_col: str = "ts", value_col: str = "value",
                     step: str = "1 hour") -> DataFrame:
    """Per-key fixed-step series with gaps filled: one row per (key,
    bucket) for EVERY step between the key's first and last event,
    zeros where nothing happened. Returns
    (key, bucket_start, n_events, value_sum).

    Bucketing uses ``window(ts, step).start`` — epoch-aligned tumbling
    buckets for ANY ``step`` ("15 minutes", "6 hours", …), not just
    whole calendar units — so the observed aggregate and the generated
    spine always share the same grid (for "1 hour" this is identical to
    ``date_trunc('hour', ts)``, which is what the DuckDB oracle pins).
    The spine then steps from each key's first to last bucket by the
    same interval, so spine rows land exactly on aggregate buckets."""
    bucket = F.window(F.col(ts_col), step).getField("start")
    agg = (events.groupBy(F.col(key_col).alias("key"),
                          bucket.alias("bucket_start"))
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum(value_col), 6).alias("value_sum")))
    bounds = (events.groupBy(F.col(key_col).alias("key"))
              .agg(F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi")))
    spine = bounds.select(
        "key", F.explode(F.sequence(
            F.col("_lo"), F.col("_hi"),
            F.expr(f"INTERVAL {step}"))).alias("bucket_start"))
    return (spine.join(agg, ["key", "bucket_start"], "left")
            .select(F.col("key").alias(key_col), "bucket_start",
                    F.coalesce("n_events", F.lit(0)).cast("bigint")
                    .alias("n_events"),
                    F.coalesce("value_sum", F.lit(0.0)).alias("value_sum")))


def zscore_flags(series: DataFrame, key_col: str, value_col: str,
                 z_threshold: float = 3.0) -> DataFrame:
    """Per-key z-score outlier flags over a (regular) series — the
    monitoring step after :func:`resample_gapfill`: a bucket whose value
    sits more than ``z_threshold`` sample standard deviations from its
    key's mean is an anomaly (traffic spike, dead sensor — and BECAUSE
    the series is gap-filled, a silent outage shows up as a run of
    zero buckets that this flags, rather than as missing rows nothing
    would flag).

    The moments are spelled out as explicit sum / sum-of-squares /
    count windows rather than a library ``stddev``: the inputs are
    integers, so the window sums are EXACT, and mean/variance/z are
    then a fixed double expression tree the DuckDB twin reproduces
    bit-for-bit (library stddevs differ by accumulation algorithm).
    One key-partitioned window, no ordering requirement; a
    constant-valued key (variance 0) yields NULL zscores and no flags."""
    w = Window.partitionBy(key_col)
    v = F.col(value_col)
    s = F.sum(v).over(w).cast("double")
    sq = F.sum(v * v).over(w).cast("double")
    n = F.count(F.lit(1)).over(w).cast("double")
    mean = s / n
    var = (sq - s * s / n) / (n - F.lit(1.0))
    z = (v.cast("double") - mean) / F.sqrt(var)
    return (series
            .withColumn("zscore",
                        F.round(F.when(var > 0, z), 6))
            .withColumn("is_anomaly",
                        F.when(F.abs(F.col("zscore")) > z_threshold, 1)
                        .otherwise(0).cast("int")))


def with_rolling_mean(series: DataFrame, key_col: str,
                      order_col: str, value_col: str,
                      window: int = 3,
                      out_col: str = "rolling_mean") -> DataFrame:
    """Trailing ``window``-row mean over a REGULAR series (run after
    :func:`resample_gapfill` — on a gappy series a row-frame window
    would silently span unequal time). One (key)-partitioned
    Exchange+Sort."""
    w = (Window.partitionBy(key_col).orderBy(order_col)
         .rowsBetween(-(window - 1), 0))
    return series.withColumn(out_col,
                             F.round(F.avg(value_col).over(w), 6))


def rolling_actives(events: DataFrame, window_days: int = 7,
                    user_col: str = "user_id",
                    ts_col: str = "ts") -> DataFrame:
    """Rolling distinct actives: per calendar day, the distinct users
    active THAT day (dau), the distinct users active in the trailing
    ``window_days`` window (wau — inclusive of the day itself), and the
    dau/wau "stickiness" ratio — the DAU/WAU engagement metric every
    product dashboard carries. Returns (day, dau, wau, stickiness) for
    each day that has events.

    Rolling COUNT DISTINCT is not a window function (distinctness does
    not merge across frames), so the scalable formulation reduces
    first and fans out second: the raw stream collapses to the DISTINCT
    (user, day) grid — the ONLY pass over event-scale data, and the
    only event-scale shuffle — then each grid row fans out to the
    ``window_days`` target days it covers via an exploded date
    sequence. The per-(user, target day) dedup carries an
    "active-on-the-day-itself" flag as a max-aggregate, so ONE grid
    rollup yields both counts: dau = Σ flag, wau = row count — no
    second scan of the events and no dau⋈wau join. Cost at 100 TB:
    the event-scale dedup shuffle, then a ``window_days``× blowup of
    the (users × days) GRID, orders of magnitude smaller than the
    stream. A self-range-join formulation (day BETWEEN d-6 AND d)
    would force a nested-loop or per-day rescan; the explode keeps it
    an equi-join-free aggregation shape.

    Days with no events never emit: a real event day always has ≥ 1
    offset-zero contributor (dau ≥ 1), while phantom trailing days past
    the data's horizon and interior gap days have dau = 0 and are
    filtered — every emitted wau covers a day that actually occurred."""
    day = F.to_date(F.col(ts_col))
    du = (events.select(day.alias("day"), F.col(user_col).alias("u"))
          .distinct())
    fan = du.select(
        "u", F.col("day").alias("_d0"),
        F.explode(F.sequence(
            F.col("day"), F.date_add(F.col("day"), window_days - 1)))
        .alias("day"))
    per = (fan.groupBy("u", "day")
           .agg(F.max((F.col("_d0") == F.col("day")).cast("int"))
                .alias("_today")))
    return (per.groupBy("day")
            .agg(F.sum("_today").alias("dau"),
                 F.count("*").alias("wau"))
            .filter(F.col("dau") > 0)
            .select("day", "dau", "wau",
                    F.round(F.col("dau").cast("double") / F.col("wau"), 6)
                    .alias("stickiness")))


def mad_flags(series: DataFrame, key_col: str, value_col: str,
              threshold: float = 3.5) -> DataFrame:
    """Robust per-key outlier flags via MEDIAN / MAD — the companion to
    :func:`zscore_flags` for series where the anomaly itself poisons
    the moments: one hour of 100× traffic drags the mean and stddev so
    far that the z-score UNDER-flags (masking), while the median and
    the median absolute deviation barely move (50% breakdown point vs
    0%). The standard robust z is ``0.6745 · (x − median) / MAD``
    (Iglewicz & Hoaglin's modified z-score; 0.6745 rescales MAD to σ
    under normality), flagged above ``threshold`` (their recommended
    3.5).

    Two tiny groupBys over the already-resampled series (median, then
    MAD of the joined residuals) — the series is buckets × keys,
    orders of magnitude below events, so the exact percentile
    aggregate is safe here; at raw-event scale use the grouped
    histogram sketch (`operators/quantiles.py`) for the median
    instead. A constant key (MAD 0) yields NULL scores and no flags —
    "undefined", not "infinitely anomalous"."""
    v = F.col(value_col).cast("double")
    med = (series.groupBy(F.col(key_col).alias("_k"))
           .agg(F.percentile(v, F.lit(0.5)).alias("_med")))
    joined = series.join(F.broadcast(med),
                         F.col(key_col) == F.col("_k")).drop("_k")
    mad = (joined.groupBy(F.col(key_col).alias("_k"))
           .agg(F.percentile(F.abs(v - F.col("_med")), F.lit(0.5))
                .alias("_mad")))
    full = joined.join(F.broadcast(mad),
                       F.col(key_col) == F.col("_k")).drop("_k")
    rz = 0.6745 * (v - F.col("_med")) / F.col("_mad")
    return (full
            .withColumn("median", F.round(F.col("_med"), 6))
            .withColumn("mad", F.round(F.col("_mad"), 6))
            .withColumn("robust_z",
                        F.round(F.when(F.col("_mad") > 0, rz), 6))
            .withColumn("is_anomaly",
                        F.when(F.abs(F.col("robust_z")) > threshold, 1)
                        .otherwise(0).cast("int"))
            .drop("_med", "_mad"))
