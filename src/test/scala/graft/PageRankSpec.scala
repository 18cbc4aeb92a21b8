package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** q146: the join-based fixed-point-integer PageRank must equal a
  * driver-side reference implementation of the same recurrence —
  * node for node, rank for rank — and the integer channel must stay
  * well inside int64.
  */
class PageRankSpec extends SparkSpec {

  test("q146: ranks == driver reference on the symmetrized graph, top-20") {
    // rebuild the same graph on the driver
    val fwd = Tables.lineitem(spark, sf)
      .select(col("l_partkey").as("src"), (col("l_suppkey") + 10000000L).as("dst"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = (fwd ++ fwd.map { case (a, b) => (b, a) }).distinct
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    var r: Map[Long, Long] = outdeg.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map.empty[Long, Long]
      for ((s, d) <- edges)
        contrib(d) = contrib.getOrElse(d, 0L) + r(s) / outdeg(s)
      r = contrib.map { case (n, sum) => n -> (150000L + 85L * sum / 100L) }.toMap
    }
    val want = r.toSeq.sortBy { case (n, rk) => (-rk, n) }.take(20)
    val got = Graph.pageRank(spark, sf).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSeq
    assert(got === want)
    // integer channel headroom: the largest intermediate is 85 * sum of
    // all contributions, far inside int64
    assert(r.values.max < Long.MaxValue / 1000)
  }

  test("q146: rank mass is conserved up to deterministic truncation") {
    val got = Graph.pageRank(spark, sf).collect()
    assert(got.length === 20)
    // every rank >= the restart floor and sorted desc with node tiebreak
    got.foreach(row => assert(row.getLong(1) >= 150000L))
    val key = got.map(row => (-row.getLong(1), row.getLong(0)))
    assert(key.sameElements(key.sorted))
  }
}
