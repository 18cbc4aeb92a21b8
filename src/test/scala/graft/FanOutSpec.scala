package graft

import org.apache.spark.sql.functions._

/** Round-17 optimization guards: Tables.fanOut's gate semantics, and
  * result-identity of every query whose plan the fan-out / projection
  * split changed (q3/q4/q5/q17/q20 — the optimization must never move
  * a value, only the plan). */
class FanOutSpec extends SparkSpec {

  test("fanOut is the identity when the scan already has enough splits") {
    val df = spark.range(0, 1000, 1,
      spark.sparkContext.defaultParallelism + 2).toDF("id")
    assert(Tables.fanOut(df) eq df) // no exchange added at scale
  }

  test("fanOut spreads a single-split frame across defaultParallelism") {
    val one = spark.range(0, 1000, 1, 1).toDF("id")
    val p = spark.sparkContext.defaultParallelism
    assert(Tables.fanOut(one).rdd.getNumPartitions == p)
    assert(Tables.fanOut(one, col("id")).rdd.getNumPartitions == p)
    assert(Tables.fanOut(one).count() == 1000)
  }

  test("keyed fanOut co-locates equal keys (hash partitioning)") {
    val one = spark.range(0, 400, 1, 1).toDF("id")
      .withColumn("k", col("id") % 7)
    val parts = Tables.fanOut(one, col("k"))
      .select(col("k"), spark_partition_id().as("p"))
      .distinct().groupBy("k").count().collect()
    assert(parts.forall(_.getLong(1) == 1L)) // each key in exactly one partition
  }

  test("langIdFrom over precomputed counts equals the inline langId") {
    import graft.functions.Text
    import spark.implicits._
    val docs = Seq(
      "the cat and the dog went to the market and it was good",
      "der Hund und die Katze sind nicht zu Hause ich bin ein Mann",
      "le chat et la maison est dans une rue que pour les amis",
      "el perro y el gato en un una casa por con los amigos",
      "中文文本在这里",
      "", "zzz qqq 123").toDF("text")
    val twoStep = docs
      .select(col("text"),
        col("text").rlike(Text.cjkPattern).as("cjk"),
        Text.stopwordHits(col("text"), "en").as("s_en"),
        Text.stopwordHits(col("text"), "de").as("s_de"),
        Text.stopwordHits(col("text"), "fr").as("s_fr"),
        Text.stopwordHits(col("text"), "es").as("s_es"))
      .select(col("text"), Text.langIdFrom(col("cjk"), col("s_en"),
        col("s_de"), col("s_fr"), col("s_es")).as("p2"))
    val inline = docs.select(col("text"), Text.langId(col("text")).as("p1"))
    val joined = inline.join(twoStep, Seq("text")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(r.getAs[String]("p1") == r.getAs[String]("p2")))
  }

  // Plan-shape changes must not move a single value: each fanned-out
  // query equals its pre-round-17 direct form on real testdata.
  test("q3/q4/q5/q17/q20 results are identical to the un-fanned forms") {
    import graft.operators.{Dedup, Llm, Retail}
    import graft.functions.Text
    val dir = sf

    val q3new = Retail.revenuePerDay(spark, dir)
    val q3old = Tables.lineitem(spark, dir)
      .groupBy(col("l_shipdate").cast("date").as("sale_date"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)")).cast("double").as("total_revenue"))
      .orderBy("sale_date")
    assert(q3new.collect().toSeq == q3old.collect().toSeq)

    val q4new = Retail.top10Products(spark, dir)
    val q4old = Tables.lineitem(spark, dir)
      .groupBy("l_partkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
        .as("total_units_sold"))
      .orderBy(desc("total_units_sold"), asc("l_partkey")).limit(10)
    assert(q4new.collect().toSeq == q4old.collect().toSeq)

    val q5new = Retail.transactionsPerStore(spark, dir)
    val q5old = Tables.lineitem(spark, dir)
      .groupBy("l_suppkey")
      .agg(countDistinct(col("l_orderkey")).as("number_distinct_of_transactions"),
        count(col("l_orderkey")).as("number_of_transactions"))
      .orderBy(desc("number_of_transactions"), asc("l_suppkey"))
    assert(q5new.collect().toSeq == q5old.collect().toSeq)

    val q17new = Llm.langId(spark, dir)
    val q17old = Tables.documents(spark, dir)
      .select(col("lang"), Text.langId(col("text")).as("predicted"))
      .groupBy("lang", "predicted").agg(count(lit(1)).as("n"))
      .orderBy("lang", "predicted")
    assert(q17new.collect().toSeq == q17old.collect().toSeq)

    val q20new = Llm.exactDedup(spark, dir).collect().toSeq
    val q20old = Dedup.exactDedup(Tables.documents(spark, dir), "doc_id", "text")
      .agg(count(lit(1)).as("n_unique_texts"),
        sum("group_size").cast("long").as("n_docs"),
        (sum("group_size") - count(lit(1))).cast("long").as("n_removed"))
      .collect().toSeq
    assert(q20new == q20old)
  }
}
