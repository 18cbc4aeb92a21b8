package graft

import graft.sources.JsonlSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q147: JSONL sink -> permissive read round trip. The aggregate's
  * fields are each independently re-derivable from the source table;
  * the xor_sig channel proves the TEXT content survived JSON escaping
  * byte-exactly.
  */
class JsonlSpec extends SparkSpec {

  test("q147: counts + content fingerprint match the source table") {
    val docs = Tables.documents(spark, sf)
    val h = conv(substring(md5(col("text").cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val want = docs.agg(
      count(lit(1)).as("n"),
      countDistinct(col("lang")).as("nl"),
      call_function("bit_xor", h).as("sig")).collect()(0)
    val got = JsonlSource.jsonlRoundtrip(spark, sf).collect()(0)
    val byName = got.schema.fieldNames.zipWithIndex.toMap
    assert(got.getLong(byName("n_rows")) === want.getLong(0) + 25L)
    assert(got.getLong(byName("n_corrupt")) === 25L)
    assert(got.getLong(byName("n_docs")) === want.getLong(0))
    assert(got.getLong(byName("n_langs")) === want.getLong(1))
    assert(got.getLong(byName("xor_sig")) === want.getLong(2))
  }

  test("permissive read quarantines malformed lines without dropping valid ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$p/mix.json"),
      """{"doc_id":1,"lang":"en","text":"ok"}
        |{"doc_id":2,"lang":
        |{"doc_id":3,"text":"no lang"}
        |not json at all
        |""".stripMargin)
    val target = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("text", StringType)))
    val rows = JsonlSource.readPermissive(spark, Seq(s"$p/mix.json"), target)
      .localCheckpoint(true)
    assert(rows.count() === 4L)
    assert(rows.filter(col("_bad").isNotNull).count() === 2L)
    assert(rows.filter(col("doc_id") === 3L).select("text")
      .collect()(0).getString(0) === "no lang")
  }
}
