package graft

import graft.functions.Skew
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join on a skewed key") {
    // 90% of fact rows hit one hot key
    val fact = (1 to 2000).map { i =>
      (if (i % 10 == 0) (i % 5) + 1L else 1L, i.toLong)
    }.toDF("k", "payload")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c"), (5L, "d"))
      .toDF("k", "name")
    val plain = fact.join(dim, Seq("k"))
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val salted = Skew.saltedJoin(fact, dim, "k", saltSource = col("payload"), buckets = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("payload").as("s"))
    val p = plain.orderBy("k").collect().map(_.toSeq)
    val q = salted.orderBy("k").collect().map(_.toSeq)
    assert(p.toSeq === q.toSeq)
  }

  test("salt spreads a hot key over many buckets") {
    val hot = Seq.tabulate(1000)(i => (1L, i.toLong)).toDF("k", "v")
    val spread = hot.select(Skew.salt(col("v"), 16).as("s"))
      .distinct().count()
    assert(spread === 16L) // all buckets hit
  }

  test("AQE skew-join splits the planted hot partition (skew=true in " +
    "the executed plan) and results are identical to the unsplit join") {
    // The q185_skew_join bench lane's mechanism proof: a 1-in-2 hot
    // share on ONE key, sort-merge pinned, thresholds lowered so
    // local-scale partitions qualify (production trigger is 256 MB —
    // the MECHANISM is under test, not the threshold).
    val keys = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val olds = keys.map(k => k -> spark.conf.getOption(k))
    def planted() = {
      // many distinct cold keys (so the per-partition uniform mass is
      // small next to the hot key) + a 1-in-2 hot share (even ids get
      // event_id = 5·id — divisible by 5, skewJoin's hot lane; odd ids
      // get 5·id+1, never divisible): the hot partition lands ~5x the
      // median. Hot payloads stay DISTINCT — a constant payload
      // compresses the hot partition under any byte threshold and the
      // detector never sees the skew (found the hard way).
      val ev = spark.range(400000).select(
        (col("id") * 5 + when(col("id") % 2 === 0, 0L).otherwise(1L))
          .as("event_id"),
        pmod(col("id"), lit(9973L)).as("user_id"))
      ScaleBench.skewJoin(ev)
    }
    // baseline rows BEFORE lowering thresholds (no split)
    val plain = planted().collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    spark.conf.set(keys(0), "64KB")
    spark.conf.set(keys(1), "32KB")
    spark.conf.set(keys(2), "2")
    try {
      val j = planted()
      val split = j.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      // row-identical under the split — AQE skew handling is
      // result-transparent on the planted distribution
      assert(split.length === plain.length)
      assert(split.toSeq === plain.toSeq)
      // and the executed adaptive plan actually took the skew path
      val planStr = j.queryExecution.executedPlan.toString
      assert(planStr.contains("skew=true"),
        s"expected a skew-split sort-merge join in:\n${planStr.take(4000)}")
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
