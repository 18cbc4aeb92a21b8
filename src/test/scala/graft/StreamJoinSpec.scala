package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** The q119 oracle proves stream-stream join == batch over a one-file
  * replay; this spec splits views and purchases into time-ordered files
  * and throttles to one file per trigger, so pairs whose view and
  * purchase arrive in DIFFERENT microbatches can only be produced by
  * the join state — and the result must still equal the batch join. */
class StreamJoinSpec extends SparkSpec {
  private val WindowUs = 3600L * 1000000L

  test("matches spanning microbatch boundaries equal the batch join") {
    import spark.implicits._
    val min = 60L * 1000000
    val t0 = 1700000000L * 1000000
    // user 1: view at t0, purchases at t0+30min (in-window, later batch)
    // and t0+90min (out of window); user 2: view+purchase in one batch;
    // user 3: purchase BEFORE its view (must not match)
    val views = Seq((1L, t0), (2L, t0 + 10 * min), (3L, t0 + 50 * min))
    val purchases = Seq((1L, t0 + 30 * min), (1L, t0 + 90 * min),
      (2L, t0 + 15 * min), (3L, t0 + 40 * min))
    val dir = "/tmp/graft_ss_join_spec"
    def plant(rows: Seq[(Long, Long)], sub: String): Unit = {
      val d = s"$dir/$sub"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      // one file per event, time-ordered mtimes: maximal batch splitting
      rows.sortBy(_._2).zipWithIndex.foreach { case (r, i) =>
        val tmp = s"$dir/__tmp"
        Seq(r).toDF("user_id", "ts_us").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(s"$d/$i.parquet")
        java.nio.file.Files.move(part.toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis((i + 1) * 1000000L))
      }
    }
    plant(views, "v")
    plant(purchases, "p")
    val schema = spark.read.parquet(s"$dir/v").schema
    def run(throttle: Boolean, name: String): Set[(Long, Long, Long)] = {
      def src(sub: String) = {
        val rd = spark.readStream.schema(schema)
        (if (throttle) rd.option("maxFilesPerTrigger", "1") else rd)
          .parquet(s"$dir/$sub")
      }
      StreamOps.streamStreamAttributionFrom(src("v"), src("p"), name, WindowUs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val multi = run(throttle = true, "ssj_multi")
    val single = run(throttle = false, "ssj_single")
    val batch = (for {
      (vu, vt) <- views; (pu, pt) <- purchases
      if vu == pu && pt >= vt && pt <= vt + WindowUs
    } yield (vu, vt, pt)).toSet
    assert(batch === Set((1L, t0, t0 + 30 * min),
      (2L, t0 + 10 * min, t0 + 15 * min)), "fixture sanity")
    assert(single === batch, "single-batch stream diverged from batch")
    assert(multi === batch, "multi-batch stream diverged from batch")
  }

  test("left-outer emits unmatched views once the watermark passes them") {
    import spark.implicits._
    val min = 60L * 1000000
    val t0 = 1700000000L * 1000000
    // user 1's view converts; user 3's never does. The user -1 sentinel
    // rows (10h later, both streams) advance the watermark past every
    // real view's window — the contract a production job gets for free
    // from continuously-arriving data, and a bounded replay must plant.
    val views = Seq((1L, t0), (3L, t0 + 50 * min),
      (-1L, t0 + 600 * min), (-1L, t0 + 601 * min))
    val purchases = Seq((1L, t0 + 30 * min),
      (-1L, t0 + 600 * min), (-1L, t0 + 601 * min))
    val dir = "/tmp/graft_ss_outer_spec"
    def plant(rows: Seq[(Long, Long)], sub: String): Unit = {
      val d = s"$dir/$sub"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d))
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
      rows.sortBy(_._2).zipWithIndex.foreach { case (r, i) =>
        val tmp = s"$dir/__tmp"
        Seq(r).toDF("user_id", "ts_us").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = java.nio.file.Paths.get(s"$d/$i.parquet")
        java.nio.file.Files.move(part.toPath, dst,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis((i + 1) * 1000000L))
      }
    }
    plant(views, "v")
    plant(purchases, "p")
    val schema = spark.read.parquet(s"$dir/v").schema
    def src(sub: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/$sub")
    val got = graft.streaming.StreamOps
      .streamStreamAttributionFrom(src("v"), src("p"), "ssj_outer",
        WindowUs, joinType = "left_outer")
      .filter(col("user_id") >= 0)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got === Set(
      (1L, t0, Some(t0 + 30 * min)),     // converted
      (3L, t0 + 50 * min, None)),        // evicted unmatched -> null row
      s"got $got")
  }

  test("epoch sink: a replayed microbatch is a no-op (exactly-once)") {
    import spark.implicits._
    val inDir = "/tmp/graft_epoch_in"
    val outDir = "/tmp/graft_epoch_out"
    Seq(inDir, outDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(inDir))
    (0 until 3).foreach { i =>
      val tmp = s"$inDir/__tmp"
      (0 until 10).map(j => (i * 10L + j, s"v$i-$j")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val dst = java.nio.file.Paths.get(s"$inDir/in_$i.parquet")
      java.nio.file.Files.move(part.toPath, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis((i + 1) * 1000000L))
    }
    val schema = spark.read.parquet(s"$inDir/in_0.parquet").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "in_*.parquet").parquet(inDir)
    graft.streaming.StreamOps.runEpochSink(src, outDir)
    def state() = spark.read.parquet(outDir)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val afterRun = state()
    assert(afterRun.map(_._1) === (0L until 30L), s"got ${afterRun.size} rows")
    // simulate the at-least-once failure path: batch 1 is DELIVERED AGAIN
    val replay = afterRun.filter(p => p._1 >= 10 && p._1 < 20)
      .toDF("id", "v")
    graft.streaming.StreamOps.epochUpsert(outDir)(replay, 1L)
    assert(state() === afterRun, "replaying an epoch changed the sink")
    Seq(inDir, outDir).foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
  }
}
