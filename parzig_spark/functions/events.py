"""Event-log operators: gap-based sessionization.

The relational/event-analysis surface the reference never had (it is a
file decoder); pure Catalyst window expressions — no Python in the plan,
shuffles keyed by user only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign gap-based session numbers per user: a new session starts when
    the time since the previous event exceeds ``gap_seconds``.

    Two window passes over the same (user, ts) ordering — lag to detect
    boundaries, running sum to number sessions — one shuffle total (both
    windows share the partitioning). Timestamps compare in integer
    microseconds so SQL twins reproduce boundaries exactly.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    # parquet NTZ timestamps cast up (session tz is UTC — same instant)
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev = F.lag(tus).over(w)
    new_session = (prev.isNull() | (tus - prev > gap_seconds * 1_000_000)).cast("int")
    return df.withColumn("_new_s", new_session).withColumn(
        "session_no", F.sum("_new_s").over(w)
    ).drop("_new_s")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session aggregates over :func:`sessionize` output (event count,
    first event id, exact value cents, duration in microseconds)."""
    s = sessionize(df, user_col, ts_col, gap_seconds=gap_seconds)
    tus = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (
        s.groupBy(user_col, "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.sum(F.floor(F.col(value_col) * 100).cast("long")).alias("sum_value_cents"),
            (F.max(tus) - F.min(tus)).alias("duration_us"),
        )
    )
