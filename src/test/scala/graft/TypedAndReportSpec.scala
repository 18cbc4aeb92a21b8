package graft

import graft.model.Typed
import graft.quality.Profiler
import org.apache.spark.sql.functions._

class TypedAndReportSpec extends SparkSpec {

  test("typed Dataset surface: fields decode and typed agg matches SQL agg") {
    val ds = Typed.lineitem(spark, sf)
    assert(ds.head().l_orderkey >= 0)
    val typed = Typed.revenueByFlag(spark, sf).collect().toMap
    val sql = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("rev"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(typed.keySet === sql.keySet)
    typed.foreach { case (k, v) => assert(math.abs(v - sql(k)) < 1e-6) }
  }

  test("typed embeddings decode Array[Float]") {
    val e = Typed.embeddings(spark, sf).head()
    assert(e.embedding.length === 64)
  }

  test("profile report JSON artifact is valid and complete") {
    val path = java.nio.file.Files
      .createTempDirectory("graft_report").resolve("report.json").toString
    Profiler.writeReport(Seq(
      "nation" -> Tables.nation(spark, sf),
      "region" -> Tables.region(spark, sf)), path)
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    // parse with the JDK-free check: must round-trip through Spark's JSON reader
    import spark.implicits._
    val parsed = spark.read.json(Seq(text).toDS)
    assert(parsed.select("tables.nation.n_rows").collect().head.getLong(0) > 0)
    assert(text.contains("\"column_presence\""))
    assert(text.contains("\"n_nationkey\""))
  }
}
