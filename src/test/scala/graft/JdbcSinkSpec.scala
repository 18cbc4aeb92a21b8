package graft

import graft.sources.JdbcSink
import org.apache.spark.sql.functions._

/** JDBC sink contract (the reference's PostgreSQL-COPY sink analog,
  * S7's RDBMS lane): overwrite-replaces, types survive the round trip,
  * and partition-parallel INSERTs land every row exactly once. */
class JdbcSinkSpec extends SparkSpec {
  import spark.implicits._

  private val db = Scratch.dir("derby_spec")

  test("jdbc round trip preserves types and values") {
    val df = Seq(
      (1L, "alpha", java.sql.Date.valueOf("2022-01-10"), BigDecimal("12.3456")),
      (2L, "beta", java.sql.Date.valueOf("2022-02-28"), BigDecimal("-7.0001")))
      .toDF("id", "name", "d", "amt")
      .select(col("id"), col("name"), col("d"),
        col("amt").cast("decimal(18,4)").as("amt"))
    JdbcSink.write(df, db, "T_TYPES")
    val back = JdbcSink.read(spark, db, "T_TYPES").orderBy("id").collect()
    assert(back.length === 2)
    assert(back(0).getLong(0) === 1L)
    assert(back(0).getString(1) === "alpha")
    assert(back(0).getDate(2).toString === "2022-01-10")
    assert(back(0).getDecimal(3) === new java.math.BigDecimal("12.3456"))
    assert(back(1).getDecimal(3) === new java.math.BigDecimal("-7.0001"))
  }

  test("overwrite replaces the previous table contents") {
    JdbcSink.write(Seq((1L, "x")).toDF("id", "v"), db, "T_OVR")
    JdbcSink.write(Seq((2L, "y"), (3L, "z")).toDF("id", "v"), db, "T_OVR")
    val back = JdbcSink.read(spark, db, "T_OVR").orderBy("id").collect()
    assert(back.map(_.getLong(0)).toSeq === Seq(2L, 3L))
  }

  test("partition-parallel write lands every row exactly once") {
    val n = 5000
    val df = spark.range(n).select(col("id"),
      (col("id") * 3).as("v")).repartition(8)
    JdbcSink.write(df, db, "T_PAR")
    val back = JdbcSink.read(spark, db, "T_PAR")
    assert(back.count() === n)
    assert(back.agg(sum("v")).head().getLong(0) === 3L * n * (n - 1) / 2)
  }
}
