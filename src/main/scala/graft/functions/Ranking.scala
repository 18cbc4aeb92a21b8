package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global ranking — the scalable answer to
  * `ROW_NUMBER() OVER (ORDER BY ...)` with no PARTITION BY, which Spark
  * executes on a SINGLE partition (the whole dataset funnels through one
  * task — the classic 100 TB killer).
  *
  * Shape: range-repartition on the sort key (Spark's distributed sort
  * machinery — sampled boundaries, equal keys land in one partition),
  * rank WITHIN each partition in parallel, then add per-partition prefix
  * offsets. The only driver-side data is one row per partition (the
  * counts), bounded by the partition count, never the row count.
  *
  * The frame is localCheckpoint'ed once so the two consumers (the offset
  * aggregation and the final projection) see the SAME materialized
  * range partitioning — re-executing the sampled partitioner twice could
  * otherwise disagree across jobs.
  */
object Ranking {

  /** `df` plus a 1-based global row number `out`, ordered by `sortCols`
    * (include a unique tiebreaker for a deterministic ranking). */
  def globalRowNumber(df: DataFrame, sortCols: Seq[String],
                      out: String = "rn"): DataFrame =
    globalRowNumberWithCount(df, sortCols, out)._1

  /** [[globalRowNumber]] with explicit sort-direction expressions
    * (`desc("n"), asc("token")`) — named (not overloaded) because
    * `Seq[String]` and `Seq[Column]` erase to the same signature. */
  def globalRowNumberSorted(df: DataFrame, sortCols: Seq[Column],
                            out: String = "rn"): DataFrame =
    rankImpl(df, sortCols, out)._1

  /** [[globalRowNumber]] plus the total row count — already on the
    * driver from the per-partition count pass, so callers needing n
    * (NTILE, percent_rank) don't pay a second full execution. */
  def globalRowNumberWithCount(df: DataFrame, sortCols: Seq[String],
                               out: String = "rn"): (DataFrame, Long) =
    rankImpl(df, sortCols.map(col), out)

  private def rankImpl(df: DataFrame, cols: Seq[Column],
                       out: String): (DataFrame, Long) = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    // no sortWithinPartitions here: the intra-partition window below
    // re-sorts after its own __pid exchange anyway (localCheckpoint
    // erases ordering metadata), so a pre-sort would be paid and thrown
    // away — range partitioning alone is what the ranking needs
    val ranged = df
      .repartitionByRange(parts, cols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // one row per partition -> driver; exclusive prefix-sum the offsets
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val o = acc; acc += n; pid -> o
    } // offsets(pid) = rows in partitions before pid
    // rejoin the offsets as a BROADCAST dim (one row per partition) —
    // a when-chain over thousands of partitions would blow codegen's
    // method-size limit; a broadcast hash join is flat at any count
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val wIntra = Window.partitionBy("__pid").orderBy(cols: _*)
    val ranked = ranged
      .join(broadcast(offDf), "__pid")
      .withColumn(out, row_number().over(wIntra).cast("long") + col("__off"))
      .drop("__pid", "__off")
    (ranked, acc)
  }

  /** Global EXCLUSIVE running sum of `valueCol` in `sortCols` order,
    * without a single-partition window — the same two-pass shape as
    * [[globalRowNumberSorted]]: range-repartition on the sort key,
    * one partition-total row per partition to the driver, exclusive-
    * prefix those totals, then add the broadcast offset to each
    * partition's local exclusive running sum. The primitive under any
    * global greedy-by-order selection (token-budget corpus selection,
    * global sequence packing). */
  def globalCumSumSorted(df: DataFrame, sortCols: Seq[Column],
                         valueCol: Column,
                         out: String = "cum_before"): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // coalesce: a range partition whose values are all NULL sums to
    // NULL, and getLong would NPE — this is advertised as a general
    // primitive, so NULL values contribute 0 instead of crashing
    val sums = ranged.groupBy("__pid")
      .agg(coalesce(sum("__v"), lit(0L)).as("s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    var acc = 0L
    val offsets = sums.map { case (pid, s) => val o = acc; acc += s; pid -> o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val wIntra = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), "__pid")
      .withColumn(out,
        coalesce(sum(col("__v")).over(wIntra), lit(0L)) + col("__off"))
      .drop("__pid", "__off", "__v")
  }

  /** Global EXCLUSIVE running MAXIMUM of `valueCol` in `sortCols`
    * order, the same two-pass shape as [[globalCumSumSorted]]: range-
    * repartition on the sort key, one partition-max row per partition
    * to the driver, exclusive-prefix-max those, then combine the
    * broadcast offset with each partition's local exclusive running
    * max. Rows with no predecessor get NULL (not a sentinel — the
    * caller decides what an empty prefix means). The primitive under
    * 2-D skyline/Pareto queries: a point is on the front iff its y
    * beats the running extreme of every strictly-earlier x. */
  def globalCumMaxSorted(df: DataFrame, sortCols: Seq[Column],
                         valueCol: Column,
                         out: String = "max_before"): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__v", valueCol.cast("long"))
      .repartitionByRange(parts, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val maxes = ranged.groupBy("__pid").agg(max("__v").as("m"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).sortBy(_._1)
    var acc: Option[Long] = None
    val offsets = maxes.map { case (pid, m) =>
      val o = acc
      acc = (acc.toSeq ++ m.toSeq).reduceOption((a: Long, b: Long) => math.max(a, b))
      pid -> o
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.map { case (pid, o) =>
      (pid, o.map(java.lang.Long.valueOf).orNull)
    }.toSeq.toDF("__pid", "__off")
    val wIntra = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    ranged.join(broadcast(offDf), "__pid")
      // greatest() ignores NULLs (null only when BOTH sides are null —
      // exactly "no predecessor anywhere")
      .withColumn(out, greatest(max(col("__v")).over(wIntra), col("__off")))
      .drop("__pid", "__off", "__v")
  }

  /** SQL NTILE(k) bucket (1-based) from a 1-based global row number:
    * the first `n % k` buckets take `n/k + 1` rows, the rest `n/k` —
    * exactly the ANSI definition, computed arithmetically so no
    * single-partition window is ever needed. */
  def ntileFromRowNumber(rn: Column, n: Long, k: Int): Column = {
    val q = n / k
    val r = n % k
    // Column `/` on longs is DOUBLE division; make quotients exact by
    // subtracting the remainder first (integral quotient -> exact)
    def intDiv(a: Column, b: Long): Column =
      ((a - pmod(a, lit(b))) / lit(b)).cast("long")
    when(rn <= lit(r * (q + 1)), intDiv(rn - 1, q + 1))
      .otherwise(lit(r) + intDiv(rn - 1 - lit(r * (q + 1)), q)) + lit(1L)
  }
}
