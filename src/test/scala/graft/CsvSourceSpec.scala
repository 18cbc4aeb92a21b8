package graft

import graft.sources.CsvSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CsvSourceSpec extends SparkSpec {
  import spark.implicits._

  private val target = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DecimalType(18, 2)),
    StructField("flag", BooleanType)))

  test("alignTo: lowercase, rename, drop extras, add missing, reorder, cast") {
    val raw = Seq(
      ("1", "x", "12,50", "1", "junk"),
      ("2", "#NO VALUE", "9", "0", "junk"),
      ("3", "z", "", "", "junk"))
      .toDF("ID", "NAME", "AMT", "FLAG", "EXTRA")
    val out = CsvSource.alignTo(raw, target, renames = Map("amt" -> "amount"))
    assert(out.columns.toSeq === Seq("id", "name", "amount", "flag"))
    val rows = out.orderBy("id").collect()
    assert(rows(0).getLong(0) === 1L)
    assert(rows(0).getDecimal(2).toPlainString === "12.50")
    assert(rows(0).getBoolean(3) === true)
    assert(rows(1).isNullAt(1)) // placeholder token -> null
    assert(rows(2).isNullAt(2)) // empty -> null before cast
    assert(rows(2).isNullAt(3))
  }

  test("alignTo adds fully-missing columns as typed nulls") {
    val raw = Seq(("1", "x")).toDF("ID", "NAME")
    val out = CsvSource.alignTo(raw, target)
    assert(out.schema("amount").dataType === DecimalType(18, 2))
    assert(out.select("amount", "flag").collect().head.toSeq === Seq(null, null))
  }

  test("readAligned unions drifting schemas and keeps row counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_spec").toString
    Seq(("1", "a", "10,5", "1")).toDF("ID", "NAME", "AMOUNT", "FLAG")
      .write.mode("overwrite").option("sep", "|").option("header", "true")
      .csv(s"$dir/f1")
    Seq(("2", "b")).toDF("ID", "NAME") // schema drift: no amount/flag
      .write.mode("overwrite").option("sep", "|").option("header", "true")
      .csv(s"$dir/f2")
    val out = CsvSource.readAligned(spark, Seq(s"$dir/f1", s"$dir/f2"), target,
      withSurrogateId = true)
    assert(out.count() === 2)
    assert(out.columns.contains("row_id"))
    assert(out.select("row_id").distinct().count() === 2) // surrogate unique
    assert(out.filter(col("amount").isNull).count() === 1)
  }

  test("sniffDelimiter detects pipe") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sniff").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/x.csv"),
      "a|b|c\n1|2|3\n4|5|6\n")
    assert(CsvSource.sniffDelimiter(spark, s"$dir/x.csv") === "|")
  }
}
