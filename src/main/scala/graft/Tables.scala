package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated testdata star schema
  * (`/root/testdata/sf*`, see TESTDATA.md). One parquet file per table.
  *
  * At 100 TB these would be partitioned/bucketed warehouse tables; the
  * loader is the single seam where that swap happens (path -> catalog
  * name), so every operator above it is storage-agnostic.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** The events `ts` column has shipped in three parquet flavors across
    * testdata generations: TIMESTAMP(NANOS) (no native Spark type —
    * surfaces as LongType nanos under `legacy.parquet.nanosAsLong`),
    * plain `timestamp[us]` with isAdjustedToUTC=false (surfaces as
    * TIMESTAMP_NTZ under Spark 4's NTZ inference), and UTC-adjusted
    * micros (TimestampType). These helpers normalize any of them; the
    * session timezone is pinned to UTC, so the NTZ→LTZ cast is the
    * identity on the stored wall clock and both engines (Spark here,
    * DuckDB's naive read_parquet in the oracle) see the same instants. */
  def tsTimestamp(dt: DataType): Column = dt match {
    // integer division, NOT `/` (double division rounds: ns values
    // near 2^60 lose sub-microsecond digits and can round UP)
    case LongType         => timestamp_micros(expr("ts div 1000"))
    case TimestampNTZType => col("ts").cast(TimestampType)
    case _                => col("ts")
  }

  /** `ts` as epoch microseconds, regardless of storage flavor. */
  def tsMicros(dt: DataType): Column = dt match {
    case LongType => expr("ts div 1000")
    case dt       => unix_micros(tsTimestamp(dt))
  }

  /** Batch events loader: keeps lossless nanos in `ts_ns` (what oracle
    * comparisons use via epoch math) and exposes a micros-resolution
    * TimestampType `ts` for date logic. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
      case dt =>
        raw.withColumn("ts", tsTimestamp(dt))
          .withColumn("ts_ns", unix_micros(col("ts")) * 1000L)
    }
  }

  /** Fan a small/few-split scan out across the session's cores
    * (optimization guide §2.5 — "input skew: one huge unsplittable
    * file ... repartition immediately after the read"). The sf*
    * testdata tables are single parquet files with ONE row group, so a
    * scan — and the whole projection/partial-aggregation stage
    * pipelined above it — runs as a single task no matter how many
    * cores the session has; measured on the sf0.1 headline block, the
    * scan stage was the serial bottleneck of q3/q4/q5/q17/q20.
    *
    * When the planned scan has fewer partitions than
    * `defaultParallelism`, one shuffle of the (projected) input spreads
    * the per-row work across every core: hash-partitioned on `keys`
    * when given (choose the downstream aggregation keys so the
    * exchange also satisfies the aggregate's distribution and no second
    * full-size exchange is planned), round-robin otherwise. When the
    * input already has enough splits — any real warehouse table — this
    * is the identity: no exchange is added, so at 100 TB it never
    * shuffles. The gate also tracks the core count, so the driver's
    * lower-core bench runs fan out to proportionally fewer partitions.
    *
    * Contract: call on a freshly scanned/projected frame (the
    * partition probe plans the frame; anything with an exchange below
    * would be eagerly materialized by AQE), and project FIRST so the
    * one shuffle carries only the needed columns (guide §2.3).
    * Row-level results are unchanged: every caller aggregates with
    * order-independent functions (counts / exact decimal sums) or
    * re-sorts explicitly. */
  def fanOut(df: DataFrame, keys: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (keys.isEmpty) df.repartition(p)
    else df.repartition(p, keys: _*)
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view so `spark.sql` works against the
    * same names the DuckDB oracle sees (SURVEY §3.1 QueryRunner path). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
