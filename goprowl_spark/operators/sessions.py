"""Sessionization — gap-based event sessions (the classic window pattern;
complements the A8 metrics aggregates for event-log analysis).

Pure window algebra: lag(ts) per user → new-session flag on gap > timeout →
running sum = session index → per-session aggregates. Identical semantics
in ANSI SQL, so the driver oracle verifies values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """(user_id, session_id, n_events, session_start, session_end) with
    session_id dense per user starting at 1."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    epoch = F.col(ts_col).cast("timestamp").cast("long")  # NTZ-safe (UTC session)
    gap = epoch - F.lag(epoch).over(w)
    flagged = events.withColumn(
        "__new_session",
        F.when(gap.isNull() | (gap > gap_minutes * 60), 1).otherwise(0),
    )
    with_sid = flagged.withColumn(
        "session_id",
        F.sum("__new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_sid.groupBy(user_col, "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.max(ts_col), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
        )
        .orderBy(user_col, "session_id")
    )


def sessionize_sql(table: str, gap_minutes: int = 30) -> str:
    return f"""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {gap_minutes * 60}
              THEN 1 ELSE 0 END AS new_session
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC)
),
sid AS (
  SELECT user_id, ts,
         CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end
FROM sid
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""
