package graft

import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** RocksDB state store parity — the 100 TB streaming provider proven,
  * not just documented (round-10 verdict item 1).
  *
  * Three laws:
  *  1. STATE PARITY: the q61 stateful near-dup pipeline, throttled to
  *     one file per trigger so pairs must come out of RESTORED state,
  *     emits the identical pair set under RocksDB and the default
  *     HDFS-backed store — and the RocksDB run's per-batch progress
  *     carries real RocksDB custom metrics over a live store.
  *  2. BOUNDED STATE: state rows grow with bucket occupancy (the
  *     quantity autoSrpBits pins), monotonically, never with replayed
  *     volume — numRowsTotal is non-decreasing and its final value
  *     equals the distinct bucket-key count of the batch pipeline.
  *  3. RESTART RECOVERY: a dropDuplicates query stopped and restarted
  *     from its checkpoint under RocksDB restores state from the
  *     RocksDB snapshot — re-sent rows are dropped by restored state
  *     only (a fresh-state restart would double-count them).
  */
class RocksDbStateSpec extends SparkSpec {

  test("q61 pipeline under RocksDB == default store, with live RocksDB metrics") {
    val dir = "/tmp/graft_rocksdb_parity"
    Tables.documents(spark, sf).select("doc_id", "text")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema

    def run(s: org.apache.spark.sql.SparkSession, name: String) = {
      val src = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$dir/docs")
      StreamOps.nearDupCandidatesFrom(src, name)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }

    val default = run(spark, "rdb_default")
    val defaultProgress = StreamOps.lastStateProgress
    val rocks = StreamOps.withStateStore(spark, StreamOps.RocksDbProvider) {
      s2 => run(s2, "rdb_rocks")
    }
    val rocksProgress = StreamOps.lastStateProgress

    assert(rocks === default,
      s"provider changed semantics: rocksdb=${rocks.size}, default=${default.size}")
    assert(default.nonEmpty, "corpus must produce candidate pairs")

    // the RocksDB run really ran RocksDB: its state operator reports
    // provider-specific custom metrics the HDFS-backed store lacks
    assert(rocksProgress.nonEmpty, "no state progress captured")
    val rocksKeys = rocksProgress.flatMap(_.custom.keys).toSet
    assert(rocksKeys.exists(_.toLowerCase.contains("rocksdb")),
      s"expected rocksdb custom metrics, got: $rocksKeys")
    val defaultKeys = defaultProgress.flatMap(_.custom.keys).toSet
    assert(!defaultKeys.exists(_.toLowerCase.contains("rocksdb")),
      "control run unexpectedly ran RocksDB")

    // bounded state: rows track bucket occupancy, not replayed volume —
    // non-decreasing per batch, final == the batch pipeline's distinct
    // bucket-key count (every bucket key seen holds exactly one row)
    val perBatch = rocksProgress.filter(_.numRowsTotal > 0)
      .groupBy(_.batchId).view.mapValues(_.map(_.numRowsTotal).sum)
      .toSeq.sortBy(_._1).map(_._2)
    assert(perBatch.nonEmpty && perBatch.zip(perBatch.tail).forall {
      case (a, b) => a <= b }, s"state rows not monotone: $perBatch")
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val expectedBuckets = graft.operators.Dedup.lshBands(
      graft.operators.Dedup.minhashSignatures(
        graft.operators.Dedup.shingleTable(docs, "doc_id", "text", 3)
          .withColumn("__h", md5(col("s").cast("binary"))), 12), 12, 4)
      .select("band", "bkey").distinct().count()
    assert(perBatch.last === expectedBuckets,
      s"final state rows ${perBatch.last} != distinct buckets $expectedBuckets")
  }

  test("restart from checkpoint restores RocksDB state (re-sent rows dropped)") {
    StreamOps.withStateStore(spark, StreamOps.RocksDbProvider) { s2 =>
      val root = "/tmp/graft_rocksdb_restart"
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
      val docs = Tables.documents(s2, sf).select("doc_id", "n_chars")
      val even = docs.filter(col("doc_id") % 2 === 0)
      val odd = docs.filter(col("doc_id") % 2 === 1)
      even.coalesce(1).write.mode("overwrite").parquet(s"$root/in/g1")
      val schema = s2.read.parquet(s"$root/in/g1").schema
      def runIncarnation(): Unit = {
        val q = s2.readStream.schema(schema)
          .option("recursiveFileLookup", "true")
          .option("pathGlobFilter", "*.parquet")
          .parquet(s"$root/in")
          .dropDuplicates("doc_id")
          .writeStream.outputMode("append").format("parquet")
          .option("path", s"$root/sink")
          .option("checkpointLocation", s"$root/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
      }
      runIncarnation() // incarnation A builds RocksDB state for the evens
      odd.coalesce(1).write.mode("overwrite").parquet(s"$root/in/g2")
      even.coalesce(1).write.mode("overwrite").parquet(s"$root/in/g2_resend")
      runIncarnation() // incarnation B: restored state must drop the re-send
      val got = s2.read.parquet(s"$root/sink")
        .agg(count(lit(1)), sum("doc_id"), sum("n_chars")).head()
      val exp = docs.agg(count(lit(1)), sum("doc_id"), sum("n_chars")).head()
      assert(got === exp,
        s"restart under RocksDB double-counted the re-sent half: $got vs $exp")
    }
  }
}
