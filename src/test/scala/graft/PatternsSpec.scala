package graft

import graft.operators.Patterns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-10 continuation batch: GSP prune exactness (q232), novelty
  * replication/all-novel laws (q233), HITS closed form (q234). */
class PatternsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q232: the A-Priori prune must be invisible in the output ------
  test("q232 seqPatterns: pruned result == unpruned brute force at sf0.001") {
    val got = Patterns.seqPatterns(spark, sf)
    // brute force: no L2 gate, same trigram construction
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
    val nUsers = ev.select(countDistinct("user_id")).first().getLong(0)
    val naive = ev
      .withColumn("b", lead("event_type", 1).over(w))
      .withColumn("c", lead("event_type", 2).over(w))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .select(col("user_id"), col("event_type").as("a"), col("b"), col("c"))
      .distinct()
      .groupBy("a", "b", "c").agg(count(lit(1)).as("support"))
      .filter(col("support") * 20 >= nUsers)
      .select(concat_ws(">", col("a"), col("b"), col("c")).as("seq"),
        col("support"),
        expr(s"support * 1000000 div ${nUsers}L").as("support_ppm"))
    assert(got.count() > 0, "expected some frequent trigrams at sf0.001")
    assert(got.unionAll(naive).except(got.intersect(naive)).count() === 0L)
  }

  test("q232 seqPatterns: support is anti-monotone vs constituent bigrams") {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    val ev = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts_ns div 1000").as("us"))
      .withColumn("b", lead("event_type", 1).over(w))
      .filter(col("b").isNotNull)
      .select(col("user_id"), col("event_type").as("a"), col("b"))
      .distinct()
      .groupBy("a", "b").agg(count(lit(1)).as("s2"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Patterns.seqPatterns(spark, sf).collect().foreach { r =>
      val Array(a, b, c) = r.getAs[String]("seq").split(">")
      val s = r.getAs[Long]("support")
      assert(s <= ev((a, b)) && s <= ev((b, c)),
        s"trigram $a>$b>$c support $s exceeds a constituent bigram's")
    }
  }

  // ---- q233: novelty laws --------------------------------------------
  private def corpus(rows: Seq[(Long, String, String)]): DataFrame =
    rows.toDF("doc_id", "text", "source")

  private val tenTok = (o: Int) =>
    (0 until 10).map(i => s"tok${o + i}").mkString(" ")

  test("q233 novelty: disjoint docs are all-novel (ppm == 1e6)") {
    val docs = corpus(Seq(
      (1L, tenTok(0), "sA"), (2L, tenTok(100), "sA"), (3L, tenTok(200), "sB")))
    val out = Patterns.noveltyBySource(docs).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("novelty_ppm")).toMap
    assert(out === Map("sA" -> 1000000L, "sB" -> 1000000L))
  }

  test("q233 novelty: replicas with higher ids contribute zero novel grams") {
    val base = Seq(
      (1L, tenTok(0), "sA"), (2L, tenTok(100), "sA"), (3L, tenTok(200), "sB"))
    val replicated = base ++ base.map { case (id, t, s) => (id + 1000L, t, s) }
    val x1 = Patterns.noveltyBySource(corpus(base)).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_novel")).toMap
    val x2Rows = Patterns.noveltyBySource(corpus(replicated)).collect()
    val x2 = x2Rows
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("n_novel")).toMap
    // global novel-gram mass is replication-invariant...
    assert(x1 === x2)
    // ...and the gram totals double while novelty halves (div-exact here)
    x2Rows.foreach { r =>
      assert(r.getAs[Long]("novelty_ppm") === 500000L)
    }
  }

  test("q233 novelty: a doc repeating an earlier doc's text is 0-novel") {
    val docs = corpus(Seq(
      (1L, tenTok(0), "sA"), (2L, tenTok(0), "sB"), (3L, tenTok(0), "sB")))
    val out = Patterns.noveltyBySource(docs).collect()
      .map(r => (r.getAs[String]("source"),
        r.getAs[Long]("n_novel"), r.getAs[Long]("novelty_ppm"))).toSet
    assert(out === Set(("sA", 3L, 1000000L), ("sB", 0L, 0L)))
  }

  // ---- q234: HITS closed form on a planted bipartite graph -----------
  test("q234 hits: two unrolled rounds match the hand computation") {
    // c1 -> {10,11,12}, c2 -> {10}; a1 = (10:2, 11:1, 12:1);
    // h1 = (c1: 2+1+1 = 4, c2: 2); a2 = (10: 4+2 = 6, 11: 4, 12: 4)
    val e = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 10L), (2L, 10L))
      .toDF("c", "p") // duplicate edge must not double-count
    val got = Patterns.hitsFromEdges(e)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((10L, 2L, 6L), (11L, 1L, 4L), (12L, 1L, 4L)))
  }

  test("q234 hits: sf0.001 auth1 equals the independent distinct-customer count") {
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
    val o = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val indeg = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(countDistinct("o_custkey").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Patterns.hitsAuthority(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("auth1") === indeg(r.getAs[Long]("p_partkey")))
    }
    // top-20 ordering: auth2 non-increasing, key ascending within ties
    val pairs = rows.map(r => (r.getAs[Long]("auth2"), r.getAs[Long]("p_partkey")))
    assert(pairs.sliding(2).forall { case Array((a2a, pa), (a2b, pb)) =>
      a2a > a2b || (a2a == a2b && pa < pb) })
  }
}
