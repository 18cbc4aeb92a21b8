package graft

import graft.operators.Dedup
import graft.streaming.StreamOps
import org.apache.spark.sql.functions._

/** Streaming incremental-ingest dedup must equal the batch cross-corpus
  * form exactly: new docs streamed against the PERSISTED index of the
  * existing corpus, throttled to one file per trigger so arrivals span
  * several microbatches — the production continuous-ingest shape. The
  * pipeline holds zero streaming state (all joins are stream-static),
  * so equality across an arbitrary microbatch partitioning is the
  * correctness contract. */
class StreamCrossCorpusSpec extends SparkSpec {

  test("streamed new-vs-old pairs equal batch minhashLshPairsAgainst") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") < 250)
    val incoming = docs.filter(col("doc_id") >= 250)

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), math.round(r.getDouble(2) * 1e9))

    val batch = Dedup.minhashLshPairsAgainst(incoming, existing,
        "doc_id", "text", n = 3, numHashes = 12, bands = 4, threshold = 0.3)
      .collect().map(key).toSet

    val dir = "/tmp/graft_stream_xcorpus"
    incoming.repartition(4) // four part files => four microbatches
      .write.mode("overwrite").parquet(s"$dir/docs")
    val idxPath = s"$dir/idx"
    StreamOps.writeNearDupIndex(existing, "doc_id", "text", idxPath)
    val schema = spark.read.parquet(s"$dir/docs").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/docs")
    val streamed = StreamOps.streamNearDupAgainst(src, "xc_multi", idxPath,
        threshold = 0.3)
      .collect().map(key).toSet

    assert(streamed === batch,
      s"stream diverged from batch: stream=${streamed.size}, batch=${batch.size}")
    assert(batch.nonEmpty, "split must produce cross-corpus pairs")
  }

  test("streamed incremental clustering equals from-scratch CC across microbatches") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val existing = docs.filter(col("doc_id") % 10 =!= 0)
    val incoming = docs.filter(col("doc_id") % 10 === 0)

    val full = Dedup.starContractComponents(
        Dedup.minhashLshPairs(docs, "doc_id", "text", 3, 12, 4, 0.5))
    assert(full.converged)
    val expect = Dedup.clustersFromLabels(full.labels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val dir = "/tmp/graft_stream_incc"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    incoming.repartition(3) // three part files => three microbatches
      .write.mode("overwrite").parquet(s"$dir/docs")
    val schema = spark.read.parquet(s"$dir/docs").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/docs")
    val got = StreamOps.streamIncrementalClusters(existing, src,
        s"$dir/idx", n = 3, numHashes = 12, bands = 4, threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    assert(got === expect,
      s"incremental clustering diverged: got=${got.size}, want=${expect.size}")
    assert(expect.nonEmpty, "split must produce clusters")
  }
}
