package graft

import graft.quality.Profiler
import org.apache.spark.sql.functions._

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("nullCounts + columnDescription report per-column stats") {
    val df = Seq(("a", Some(1)), ("b", None), ("a", Some(2)))
      .toDF("k", "v")
    val nulls = Profiler.nullCounts(df).collect().head
    assert(nulls.getAs[Long]("k__nulls") === 0L)
    assert(nulls.getAs[Long]("v__nulls") === 1L)
    val desc = Profiler.columnDescription(df).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(desc("k") === (("string", 0L, 2L)))
    assert(desc("v") === (("int", 1L, 2L)))
  }

  test("approx distinct (HLL) lands within 5% of exact on real data") {
    val ev = Tables.events(spark, sf).select("user_id", "props")
    val exact = Profiler.distinctCounts(ev).collect().head
    val approx = Profiler.distinctCounts(ev, approx = true).collect().head
    Seq("user_id__n_unique", "props__n_unique").foreach { c =>
      val e = exact.getAs[Long](c).toDouble
      val a = approx.getAs[Long](c).toDouble
      assert(math.abs(a - e) / e < 0.05, s"$c: approx $a vs exact $e")
    }
  }

  test("errorTaxonomy classifies lexical classes with reference priorities") {
    val df = Seq("42", "-7", "1,234.5", "1.234,5", "true", "2024-01-31",
      "12:34:56", "#NO VALUE", "", "  ", "garbage!", null).toDF("v")
    val out = Profiler.errorTaxonomy(df, "v").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out === Map(
      "int" -> 2L, "us_numeric" -> 1L, "eu_numeric" -> 1L, "bool" -> 1L,
      "iso_date" -> 1L, "time" -> 1L, "null_token" -> 1L, "empty" -> 2L,
      "other" -> 1L, "null" -> 1L))
  }

  test("schemaPresence builds the column/table matrix") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((1, "y")).toDF("id", "only_b")
    val m = Profiler.schemaPresence(Seq("a" -> a, "b" -> b)).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getBoolean(2)).toMap
    assert(m(("id", "a")) && m(("id", "b")))
    assert(m(("only_a", "a")) && !m(("only_a", "b")))
    assert(!m(("only_b", "a")) && m(("only_b", "b")))
  }
}
