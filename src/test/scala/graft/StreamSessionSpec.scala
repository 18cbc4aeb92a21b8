package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** The q101 oracle proves stream == batch over a single-file replay; a
  * single microbatch hands each user's full timeline to ONE group call,
  * so the cross-batch state merge never runs. This spec splits the
  * timeline at its median timestamp into two time-ordered files and
  * throttles to one file per trigger: sessions spanning the split can
  * only be stitched by state, and the result must still equal both the
  * one-batch replay and the batch window operator. */
class StreamSessionSpec extends SparkSpec {
  private val GapUs = 30L * 60 * 1000 * 1000

  test("sessions spanning microbatch boundaries equal batch sessionization") {
    val dir = "/tmp/graft_stream_sess"
    val ev = Tables.events(spark, sf).filter(col("user_id") < 100)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val cut = ev.agg(expr("percentile_approx(ts_us, 0.5)")).head.getLong(0)
    // two TIME-ORDERED files: all early events, then all late events —
    // the in-order-ingest contract the operator documents
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String,
                 mtimeMs: Long): Unit = {
      val tmp = s"$dir/__tmp"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$dir/in/$name")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // FileStreamSource orders by modification time (ms granularity;
      // ties break arbitrarily) — pin distinct mtimes so the two files
      // cannot tie and arrive out of order
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs))
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir/in"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    writeOne(ev.filter(col("ts_us") <= cut), "0.parquet", 1000000L)
    writeOne(ev.filter(col("ts_us") > cut), "1.parquet", 2000000L)
    val schema = spark.read.parquet(s"$dir/in").schema

    def run(throttle: Boolean, name: String) = {
      val rd = spark.readStream.schema(schema)
      val src = (if (throttle) rd.option("maxFilesPerTrigger", "1") else rd)
        .parquet(s"$dir/in")
      StreamOps.sessionStatsFrom(src, name, GapUs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }

    val multi = run(throttle = true, "sess_multi")
    val single = run(throttle = false, "sess_single")
    val batch = graft.operators.Events.sessionStats(
        Tables.events(spark, sf).filter(col("user_id") < 100)
          .withColumn("ts_us", unix_micros(col("ts"))),
        GapUs, tsCol = "ts_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(multi === batch, "multi-batch stream diverged from batch")
    assert(single === batch, "single-batch stream diverged from batch")
    // the split must actually cut through sessions for the test to bite
    assert(batch.exists(_._3 > 1), "fixture needs multi-session users")
  }

  test("TTL evicts an idle user; segments still sum to the batch answer") {
    import spark.implicits._
    val dir = "/tmp/graft_stream_ttl"
    val min = 60L * 1000000
    val t0 = 1600000000L * 1000000
    // user 1 goes idle for 230 min (> TTL = 2*gap = 60 min) while user 2
    // keeps the watermark advancing, then returns — the eviction +
    // fresh-segment path. Files are in global time order (the operator's
    // in-order ingest contract).
    val files = Seq(
      Seq((1L, t0), (2L, t0 + 5 * min), (1L, t0 + 10 * min)),
      Seq((2L, t0 + 180 * min)),
      Seq((2L, t0 + 181 * min)), // watermark now past user 1's timeout
      Seq((1L, t0 + 240 * min), (2L, t0 + 240 * min)))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$dir/in"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    files.zipWithIndex.foreach { case (rows, i) =>
      val tmp = s"$dir/__tmp"
      rows.toDF("user_id", "ts_us").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$dir/in/$i.parquet")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis((i + 1) * 1000000L))
    }
    val schema = spark.read.parquet(s"$dir/in").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/in")
    val segs = StreamOps
      .sessionSegmentsFrom(src, "sess_ttl", GapUs, ttlUs = 2L * GapUs)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // eviction observed: user 1 has exactly two state segments
    assert(segs.count(_._1 == 1L) === 2,
      s"user 1 was not evicted/restarted: ${segs.toSeq}")
    assert(segs.count(_._1 == 2L) === 1, s"user 2 evicted early: ${segs.toSeq}")
    // and the summed segments equal the batch sessionization
    val totals = segs.groupBy(_._1).view
      .mapValues(ss => (ss.map(_._3).sum, ss.map(_._4).sum)).toMap
    val batch = graft.operators.Events.sessionStats(
        files.flatten.toDF("user_id", "ts_us"), GapUs, tsCol = "ts_us")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(totals === batch)
    assert(batch(1L) === ((3L, 2L)) && batch(2L) === ((4L, 3L)))
  }
}
