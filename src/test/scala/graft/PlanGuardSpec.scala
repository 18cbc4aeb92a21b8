package graft

import graft.plans.PlanGuard
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

class PlanGuardSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def beforeEach(): Unit = {
    PlanGuard.install(spark)
    spark.conf.set("spark.graft.planGuard", "off")
  }
  override def afterEach(): Unit =
    spark.conf.set("spark.graft.planGuard", "off")

  private def big = spark.range(5000).toDF("a")
  private def big2 = spark.range(5000).toDF("b")

  test("fail mode rejects an unkeyed join of two unbounded sides") {
    spark.conf.set("spark.graft.planGuard", "fail")
    val cross = big.join(big2, col("a") < col("b"))
    val e = intercept[IllegalStateException](cross.count())
    assert(e.getMessage.contains("no equality condition"))
  }

  test("fail mode passes keyed joins, bounded crosses, and guarded ops") {
    spark.conf.set("spark.graft.planGuard", "fail")
    // equality join: fine
    assert(big.join(big2, col("a") === col("b")).count() === 5000)
    // 1-row bounds frame cross join (the retail q1/q2 pattern): exempt
    val bounds = big.agg(max("a").as("mx"))
    assert(big.crossJoin(bounds).filter(col("a") === col("mx")).count() === 1)
    // the bucketed dedup pipeline must survive its own guard
    val pairs = graft.operators.Dedup.minhashLshPairs(
      Tables.documents(spark, sf).limit(100), "doc_id", "text", 3, 12, 4, 0.5)
    pairs.write.mode("overwrite").format("noop").save()
  }

  test("warn mode lets the query run") {
    spark.conf.set("spark.graft.planGuard", "warn")
    assert(big.join(big2, col("a") < col("b")).limit(1).count() >= 0)
  }

  test("window dial catches a global ORDER BY window, passes partitioned") {
    import org.apache.spark.sql.expressions.Window
    spark.conf.set("spark.graft.planGuard", "fail")
    spark.conf.set("spark.graft.planGuard.windows", "fail")
    try {
      // consume rn: an unused window column is pruned before the
      // optimizer rule ever sees a Window node
      val e = intercept[IllegalStateException] {
        big.withColumn("rn",
          row_number().over(Window.orderBy("a")))
          .agg(max("rn")).head()
      }
      assert(e.getMessage.contains("no PARTITION BY"))
      // partitioned window: fine
      assert(big.withColumn("g", col("a") % 7)
        .withColumn("rn",
          row_number().over(Window.partitionBy("g").orderBy("a")))
        .agg(max("rn")).head().getInt(0) > 0)
      // bounded child (LIMIT): exempt — a top-k sort frame is legit
      assert(big.limit(100).withColumn("rn",
        row_number().over(Window.orderBy("a")))
        .agg(max("rn")).head().getInt(0) === 100)
      // the distributed ranker must survive its own guard
      assert(graft.functions.Ranking
        .globalRowNumber(big, Seq("a")).count() === 5000)
    } finally spark.conf.set("spark.graft.planGuard.windows", "off")
  }
}
