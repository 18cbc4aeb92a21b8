package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream batch analytics. Sessionization works on raw nanosecond
  * longs (`ts_ns` from Tables.events) — never on doubles, since ns since
  * epoch exceeds 2^53 and would silently lose precision in a double.
  *
  * Scale: the window is partitioned by user_id — the shuffle is one
  * hash partitioning of the events table, and each user's timeline sorts
  * within a partition (no global sort). Skewed hot users would be the
  * thing to watch at 100 TB (AQE skew handling or per-user pre-agg).
  */
object Events {

  /** Gap-based sessionization: a new session starts after `gap` (in the
    * units of `tsCol`, a monotone integer timestamp) of inactivity.
    * Adds session_seq (1-based per user). */
  def sessionize(ev: DataFrame, gap: Long, tsCol: String = "ts_ns"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(tsCol)
    ev.withColumn("prev_ts", lag(tsCol, 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col(tsCol) - col("prev_ts") > gap, 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-user session stats (event count, session count). */
  def sessionStats(ev: DataFrame, gap: Long, tsCol: String = "ts_ns"): DataFrame =
    sessionize(ev, gap, tsCol)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("new_session").cast("long").as("n_sessions"))
      .orderBy("user_id")
}
