package graft

import graft.operators.{Quality, Retrieval, Temporal}
import org.apache.spark.sql.functions._

/** Round-10 continuation batch 2: RRF fusion wiring (q235), interval
  * union coverage laws (q236), winsorization closed form + idempotence
  * (q237). */
class HybridOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- q235: reciprocal-rank fusion ----------------------------------
  test("q235 rrf: contributions are the integer RRF of each list's rank") {
    val rows = Retrieval.rrfFusion(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    // every contribution is 0 (absent from that list) or 1e6/(60+r)
    val legal = (1 to 50).map(r => 1000000L / (60L + r)).toSet + 0L
    rows.foreach { r =>
      val (s, d, f) = (r.getAs[Long]("s_contrib"), r.getAs[Long]("d_contrib"),
        r.getAs[Long]("rrf"))
      assert(legal.contains(s) && legal.contains(d) && f === s + d)
    }
    // the fusion is doing real work at sf0.001: some doc appears in BOTH
    // lists, and some docs come from only one of the two
    assert(rows.exists(r =>
      r.getAs[Long]("s_contrib") > 0 && r.getAs[Long]("d_contrib") > 0))
    assert(rows.exists(r => r.getAs[Long]("s_contrib") === 0L))
    assert(rows.exists(r => r.getAs[Long]("d_contrib") === 0L))
    // output ordering: fused score non-increasing, doc_id tiebreak
    val pairs = rows.map(r => (r.getAs[Long]("rrf"), r.getAs[Long]("doc_id")))
    assert(pairs.sliding(2).forall { case Array((fa, da), (fb, db)) =>
      fa > fb || (fa == fb && da < db)
    case _ => true })
  }

  test("q235 rrf: sparse contributions match the independently ranked BM25 list") {
    // independent sparse ranking: q173's top-10 must be a rank-prefix of
    // the fused sparse list, so its docs' s_contrib values are pinned
    val top10 = Retrieval.bm25TopK(spark, sf).collect()
      .map(_.getAs[Long]("doc_id")).zipWithIndex
      .map { case (id, i) => id -> 1000000L / (60L + i + 1) }.toMap
    val fused = Retrieval.rrfFusion(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("s_contrib")).toMap
    top10.foreach { case (id, want) =>
      fused.get(id).foreach(got => assert(got === want,
        s"doc $id sparse contribution $got != expected $want"))
    }
    assert(top10.keySet.intersect(fused.keySet).nonEmpty,
      "expected some BM25 top-10 doc to survive into the fused top-20")
  }

  // ---- q236: interval union coverage ---------------------------------
  private def spans(rows: Seq[(Long, Long, Long, Long)]) =
    rows.toDF("user_id", "event_id", "s", "e")

  test("q236 coverage: planted overlap/touch/containment/gap closed form") {
    // user 1: [0,10)+[5,20) merge, [20,30) touches (same component),
    //         [41,43) contained in [40,45): 2 components, covered 35
    val got = Temporal.coverageOfSpans(spans(Seq(
        (1L, 1L, 0L, 10L), (1L, 2L, 5L, 20L), (1L, 3L, 20L, 30L),
        (1L, 4L, 40L, 45L), (1L, 5L, 41L, 43L),
        (2L, 6L, 100L, 101L))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === Set((1L, 5L, 2L, 35L), (2L, 1L, 1L, 1L)))
  }

  test("q236 coverage: matches a brute-force per-user union at sf0.001") {
    val raw = Tables.events(spark, sf).select(col("user_id"),
        expr("ts_ns div 1000").as("s"),
        (expr("ts_ns div 1000")
          + round(col("value") * 1000).cast("long") * 600000L).as("e"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = raw.groupBy(_._1).map { case (u, rs) =>
      val sorted = rs.map(t => (t._2, t._3)).sortBy(identity)
      // classic in-memory merge
      var comps = 0L; var covered = 0L
      var curS = Long.MinValue; var curE = Long.MinValue
      sorted.foreach { case (s0, e0) =>
        if (curE == Long.MinValue || s0 > curE) {
          if (curE != Long.MinValue) covered += curE - curS
          comps += 1; curS = s0; curE = e0
        } else if (e0 > curE) curE = e0
      }
      if (curE != Long.MinValue) covered += curE - curS
      u -> ((rs.size.toLong, comps, covered))
    }
    val got = Temporal.intervalCoverage(spark, sf).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got === expect)
    // the ×600 dial makes merging REAL on this data — if every span were
    // its own component the merge path would be dead code
    assert(got.values.exists { case (n, c, _) => c < n })
  }

  // ---- q237: winsorization -------------------------------------------
  private def evFrame(rows: Seq[(String, Long, Long)]) =
    rows.toDF("event_type", "event_id", "mu")

  test("q237 winsorize: 1..100 closed form (p5=5, p95=95, 4 low / 5 high)") {
    val got = Quality.winsorizeCore(evFrame(
        (1L to 100L).map(i => ("t", i, i))))
      .collect().map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Long]("lo_mu"), r.getAs[Long]("hi_mu"),
        r.getAs[Long]("n_low"), r.getAs[Long]("n_high"),
        r.getAs[Long]("sum_mu"), r.getAs[Long]("sum_wmu")))
    // sum 1..100 = 5050; capping replaces 1..4 by 5 (+10) and
    // 96..100 by 95 (-15): 5045
    assert(got.toSeq === Seq(("t", 100L, 5L, 95L, 4L, 5L, 5050L, 5045L)))
  }

  test("q237 winsorize: capped-fraction bounds and idempotence at sf0.001") {
    val ev = Tables.events(spark, sf).select(col("event_type"),
      col("event_id"), round(col("value") * 1000).cast("long").as("mu"))
    val out = Quality.winsorizeCore(ev).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      val k5 = (5 * n + 99) / 100; val k95 = (95 * n + 99) / 100
      // nearest-rank semantics: strictly-below-lo rows all rank < k5,
      // strictly-above-hi rows all rank > k95
      assert(r.getAs[Long]("n_low") <= k5 - 1)
      assert(r.getAs[Long]("n_high") <= n - k95)
      assert(r.getAs[Long]("lo_mu") <= r.getAs[Long]("hi_mu"))
      val (lo, hi) = (r.getAs[Long]("lo_mu"), r.getAs[Long]("hi_mu"))
      assert(r.getAs[Long]("sum_wmu") >= n * lo
        && r.getAs[Long]("sum_wmu") <= n * hi)
    }
    // winsorize(winsorize(x)) == winsorize(x): rank-k of the capped
    // multiset is still lo/hi, so nothing moves on the second pass
    val capped = Quality.winsorizeCore(ev)
      .select(col("event_type"), col("lo_mu"), col("hi_mu"))
      .join(ev, "event_type")
      .select(col("event_type"), col("event_id"),
        least(greatest(col("mu"), col("lo_mu")), col("hi_mu")).as("mu"))
    val second = Quality.winsorizeCore(capped).collect()
    second.foreach { r =>
      assert(r.getAs[Long]("n_low") === 0L && r.getAs[Long]("n_high") === 0L)
      assert(r.getAs[Long]("sum_mu") === r.getAs[Long]("sum_wmu"))
    }
    val firstSums = out.map(r => r.getString(0) -> r.getAs[Long]("sum_wmu")).toMap
    second.foreach { r =>
      assert(r.getAs[Long]("sum_mu") === firstSums(r.getString(0)))
    }
  }
}
