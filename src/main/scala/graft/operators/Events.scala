package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** As-of join: for each left row, attach the value columns of the
    * LATEST right row with the same key and right.ts <= left.ts (the
    * point-in-time lookup Spark has no built-in for).
    *
    * Implementation is the scalable union-tag form, not a range join:
    * tag right rows 0 and left rows 1, union, then one window per key
    * ordered by (ts, tag) carries the last non-null right payload
    * forward onto each left row. Cost is ONE hash shuffle of
    * left+right on the key and a per-partition sort — no O(|L| x |R|)
    * range-candidate explosion, no bucketed interval index needed.
    * Right rows at exactly left.ts sort before the left row (tag 0 <
    * tag 1), giving inclusive <= semantics. `left` and `right` must
    * share the key and ts column names; right payload columns surface
    * as `asof_<name>` (null when no prior right row exists). */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               valueCols: Seq[String]): DataFrame = {
    val payload = struct(valueCols.map(col): _*)
    val r = right.select(col(key), col(tsCol), payload.as("__rv"))
      .withColumn("__tag", lit(0))
    val l = left.withColumn("__tag", lit(1))
      .withColumn("__rv", lit(null).cast(r.schema("__rv").dataType))
    // Final sort key: when several right rows share (key, ts), ties
    // resolve on the payload itself, so the carried value is identical
    // across runs and partitionings (the determinism contract; without
    // it last() picks an arbitrary peer). Struct ordering requires every
    // field to be orderable — a payload containing a MapType would fail
    // analysis — so unorderable payloads tie-break on a hash of their
    // JSON form instead (still deterministic; equal payloads hash equal,
    // distinct ones collide only at ~2^-64).
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: org.apache.spark.sql.types.MapType => false
      case s: org.apache.spark.sql.types.StructType =>
        s.fields.forall(f => orderable(f.dataType))
      case a: org.apache.spark.sql.types.ArrayType => orderable(a.elementType)
      case _ => true
    }
    val tie =
      if (orderable(r.schema("__rv").dataType)) col("__rv")
      else xxhash64(to_json(col("__rv")))
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("__tag"), tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r, allowMissingColumns = true)
      .withColumn("__last", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
    val outCols = left.columns.map(col) ++
      valueCols.map(c => col(s"__last.$c").as(s"asof_$c"))
    carried.select(outCols.toSeq: _*)
  }

  /** Interval-overlap (range) join between two interval sets, bucketed:
    * each interval explodes into the time buckets it covers (`sequence`
    * over floor-divided bounds — codegen'd, no lambda), candidates come
    * from bucket EQUALITY joins, and only candidates pay the exact
    * overlap verify. The same de-cartesian shape as the LSH operators:
    * at 100 TB an interval join written as an inequality join is a
    * broadcast-nested-loop bomb; bucketing makes it a hash join whose
    * cost tracks total covered buckets, with `bucket` chosen near the
    * median interval length. Inputs need (idCols..., startCol, endCol);
    * returns distinct (left ids, right ids) pairs that truly overlap. */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          startCol: String, endCol: String,
                          bucket: Long, joinFilter: Column): DataFrame = {
    // exact FLOOR division on longs: `div` truncates toward zero, so
    // correct downward when the remainder is negative. Double division
    // here would (a) send negative bounds to the wrong bucket and
    // (b) lose exactness past 2^53 (nanosecond epochs) — either breaks
    // the "bucketing loses no pair" guarantee.
    def floorDiv(c: Column, b: Long): Column = {
      val q = call_function("div", c, lit(b))
      when(c % b < 0, q - 1).otherwise(q)
    }
    def explodeBuckets(df: DataFrame, side: String): DataFrame =
      df.select(
          (0 until df.columns.length).map(i => col(df.columns(i)).as(s"${side}_${df.columns(i)}")): _*)
        .withColumn("__bkt", explode(sequence(
          floorDiv(col(s"${side}_$startCol"), bucket),
          floorDiv(col(s"${side}_$endCol"), bucket))))
    val l = explodeBuckets(left, "l")
    val r = explodeBuckets(right, "r")
    val overlap = col(s"l_$startCol") <= col(s"r_$endCol") &&
      col(s"r_$startCol") <= col(s"l_$endCol")
    l.join(r, l("__bkt") === r("__bkt") && joinFilter && overlap)
      .drop(l("__bkt")).drop(r("__bkt"))
      .distinct()
  }

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

  /** Per-user session stats (event count, session count). Unsorted —
    * callers needing a total order add their own ORDER BY. */
  def sessionStats(ev: DataFrame, gap: Long, tsCol: String = "ts_ns"): DataFrame =
    sessionize(ev, gap, tsCol)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        sum("new_session").cast("long").as("n_sessions"))
}
