package graft

import graft.operators.Temporal
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("quartiles: match a hand-sorted exact computation per group") {
    val got = Temporal.quartiles(spark, sf).collect()
    val qty = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), floor(col("l_quantity")).cast("double").as("q"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    def interp(xs: Array[Double], p: Double): Double = {
      val pos = p * (xs.length - 1)
      val lo = pos.toInt
      if (lo == xs.length - 1) xs(lo)
      else xs(lo) + (xs(lo + 1) - xs(lo)) * (pos - lo)
    }
    got.foreach { r =>
      val xs = qty(r.getString(0))
      assert(r.getDouble(1) === interp(xs, 0.25))
      assert(r.getDouble(2) === interp(xs, 0.50))
      assert(r.getDouble(3) === interp(xs, 0.75))
      assert(r.getLong(4) === xs.length)
    }
  }

  test("gapFillDaily: dense calendar, zeros on missing days, agg preserved") {
    val rows = Temporal.gapFillDaily(spark, sf).collect()
    val days = rows.map(_.getDate(0).toLocalDate)
    // dense: every consecutive pair is exactly one day apart
    days.sliding(2).foreach { case Array(a, b) =>
      assert(java.time.temporal.ChronoUnit.DAYS.between(a, b) === 1L)
    }
    val sparse = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase" && col("user_id") % 97 === 0)
      .groupBy(to_date(col("ts")).as("day")).count()
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    rows.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(r.getLong(1) === sparse.getOrElse(d, 0L))
      if (!sparse.contains(d)) assert(r.getDouble(2) === 0.0)
    }
  }

  test("rollingRevenue7d: equals a brute-force trailing-7-day self sum") {
    val rows = Temporal.rollingRevenue7d(spark, sf).collect()
      .map(r => (r.getDate(0).toLocalDate, r.getDouble(1), r.getDouble(2)))
    val byDay = rows.map(r => r._1 -> BigDecimal(r._2)).toMap
    rows.foreach { case (d, _, roll) =>
      val brute = (0 to 6).flatMap(k => byDay.get(d.minusDays(k))).sum
      assert(BigDecimal(roll) === brute, s"day $d")
    }
    // the windows genuinely differ from the plain daily values somewhere
    assert(rows.exists { case (_, rev, roll) => roll > rev })
  }

  test("scd2History: contiguous versions, stitched intervals, one current row") {
    val rows = Temporal.scd2History(spark, sf).collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDate(3).toLocalDate, Option(r.getDate(4)).map(_.toLocalDate),
        r.getBoolean(5))
    }
    rows.groupBy(_._1).foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_._2)
      // versions are 1..n with no gaps
      assert(sorted.map(_._2).toSeq === (1L to vs.length).toSeq, s"custkey $ck")
      // exactly one open (current) interval, and it is the last version
      assert(vs.count(_._6) === 1 && sorted.last._6, s"custkey $ck")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          // valid_to of version k is valid_from of version k+1
          assert(a._5.contains(b._4), s"custkey $ck v${a._2}")
          // consecutive versions always change the tracked attribute
          assert(a._3 !== b._3, s"custkey $ck v${a._2}")
        case _ => ()
      }
    }
  }

  test("edit1NamePairs: equals the brute-force quadratic levenshtein join") {
    val c = Tables.customer(spark, sf).select("c_custkey", "c_name")
    val a = c.select(col("c_custkey").as("ka"), col("c_name").as("na"))
    val b = c.select(col("c_custkey").as("kb"), col("c_name").as("nb"))
    val brute = a.crossJoin(b)
      .filter(col("ka") < col("kb") && levenshtein(col("na"), col("nb")) <= 1)
      .select(col("ka"), col("kb"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Temporal.edit1NamePairs(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("kAnonymityAudit: summary re-derives from the grouped counts") {
    val r = Temporal.kAnonymityAudit(spark, sf).collect().head
    val counts = Tables.customer(spark, sf)
      .groupBy("c_nationkey", "c_mktsegment").count()
      .collect().map(_.getLong(2))
    val k = Temporal.KAnonThreshold
    assert(r.getLong(0) === counts.length)
    assert(r.getLong(1) === counts.count(_ < k))
    assert(r.getLong(2) === counts.filter(_ < k).sum)
    assert(r.getLong(3) === counts.min)
  }

  test("rateCap: kept+dropped partitions events; no user-day keeps over k") {
    val rows = graft.operators.Temporal.rateCap(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    assert(rows.map(r => r.getLong(1) + r.getLong(2)).sum === ev.count())
    // brute recomputation: first-3 per (user, day) by (ts_ns, event_id)
    val byUserDay = ev.select("user_id", "ts_ns", "event_id", "event_type")
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1) / 86400000000000L),
        (r.getLong(1), r.getLong(2), r.getString(3))))
      .groupBy(_._1)
    val keptBrute = byUserDay.values.flatMap(
      _.map(_._2).sortBy(t => (t._1, t._2)).take(3)).toSeq
    val keptByType = keptBrute.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    rows.foreach(r => assert(r.getLong(1) === keptByType(r.getString(0)),
      s"kept(${r.getString(0)})"))
    assert(rows.map(_.getLong(2)).sum > 0, "cap must bind on this data")
  }

  test("q262 ACF panel: an exact period-3 series scores 1e6 at lags 3 and 6") {
    import spark.implicits._
    // days 0..11, counts cycling 1,5,9 -> lags 3,6 pair identical
    // values (acf2 = +1e6 exactly); lag 1 pairs cycle (1,5),(5,9),(9,1)
    // whose covariance is negative
    val obs = (0L until 12L).flatMap(d =>
      Seq.fill((1 + 4 * (d % 3)).toInt)(d)).toDF("day")
    val rows = Temporal.acfOf(obs, 7).collect()
      .map(r => r.getAs[Long]("lag") -> r.getAs[Long]("acf2_ppm")).toMap
    assert(rows.keySet === (1L to 7L).toSet)
    assert(rows(3L) === 1000000L)
    assert(rows(6L) === 1000000L)
    assert(rows(1L) < 0L, s"lag-1 should be negative, got ${rows(1L)}")
    assert(rows(2L) < 0L)
  }

  test("q264 l-diversity flags a large group k-anonymity waves through") {
    import spark.implicits._
    // group A: 50 rows, ONE sensitive value (l=1, the leak);
    // group B: 6 rows, 3 distinct values (l=3, healthy but small)
    val rows = Seq.fill(50)(("A", "seg", "s1")) ++
      Seq.tabulate(6)(i => ("B", "seg", s"s${i % 3}"))
    val hist = Temporal.lDiversityOf(rows.toDF("qi1", "qi2", "sensitive"))
      .collect().map(r => r.getAs[Long]("l") ->
        (r.getAs[Long]("n_groups"), r.getAs[Long]("n_rows"))).toMap
    assert(hist === Map(1L -> ((1L, 50L)), 3L -> ((1L, 6L))))
  }

  test("q269 seasonal decompose: pure weekly pattern has zero residual; a spike stays in the residual") {
    import spark.implicits._
    // 28 days of exact weekly pattern 10 + 3*dow, plus day 16 spiked.
    // Day 16 is the weekly MAX (dow 6): inflating a value already above
    // the window median leaves every rolling lower median at 19, so the
    // whole spike must surface in the residual — the robustness claim a
    // rolling MEAN trend would fail (it would absorb 1/7 per window).
    def cnt(d: Long): Long = 10 + 3 * ((d + 4) % 7)
    val obs = (0L until 28L).flatMap { d =>
      val c = if (d == 16) cnt(d) + 50 else cnt(d)
      Seq.fill(c.toInt)(d)
    }.toDF("day")
    val rows = Temporal.seasonalOf(obs).collect()
      .map(r => r.getAs[Long]("day") -> r).toMap
    // the spike day's excess lands ENTIRELY in the residual
    assert(rows(16L).getAs[Long]("residual") === 50L,
      s"spike absorbed: ${rows(16L)}")
    // interior days decompose exactly: residual 0 (edge days 0-2 and
    // 25-27 see shrunken windows; their lone member per dow group
    // cannot move a lower median of 4)
    val clean = (3L to 24L).filter(_ != 16L)
      .map(d => rows(d).getAs[Long]("residual"))
    assert(clean.forall(_ === 0L), s"nonzero clean residuals: $clean")
    // identity holds everywhere by construction
    rows.values.foreach { r =>
      assert(r.getAs[Long]("cnt") === r.getAs[Long]("trend") +
        r.getAs[Long]("seasonal") + r.getAs[Long]("residual"))
    }
  }

  test("q280 markov stationary: hand-iterated 2-state chain; cycle stays uniform") {
    import spark.implicits._
    // A->B always; B->A or B->B each 1/2. True stationary (1/3, 2/3);
    // six integer-ppm power rounds from (500000, 500000) land on
    // (335937, 664062) — hand-iterated: 250000/750000, 375000/625000,
    // 312500/687500, 343750/656250, 328125/671875, 335937/664062.
    val pairs = Seq(("A", "B", 2L), ("B", "A", 1L), ("B", "B", 1L))
      .toDF("from_type", "to_type", "n")
    val got = Temporal.stationaryOf(pairs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got("A") === ((335937L, 2L)))
    assert(got("B") === ((664062L, 2L)))
    // a deterministic 3-cycle is stationary at the uniform init:
    // every round moves the full 333333 mass around the ring
    val cyc = Seq(("A", "B", 5L), ("B", "C", 7L), ("C", "A", 2L))
      .toDF("from_type", "to_type", "n")
    val g2 = Temporal.stationaryOf(cyc).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g2 === Map("A" -> 333333L, "B" -> 333333L, "C" -> 333333L))
  }

  test("q283 twap: duration-weighted, not row-weighted; last event drops") {
    import spark.implicits._
    // user 1: v=10 held 100us, v=20 held 300us, then a terminal event.
    // TWAP = (10*100 + 20*300) / 400 = 17.5 — a row-weighted mean
    // would say 15 (and 16.6 with the terminal event wrongly kept).
    val ev = Seq(
      (1L, 1L, "x", 10.0, 0L), (1L, 2L, "x", 20.0, 100L),
      (1L, 3L, "x", 99.0, 400L),
      (2L, 4L, "y", 5.0, 0L), (2L, 5L, "y", 7.0, 50L)
    ).toDF("user_id", "event_id", "event_type", "value", "us")
    val got = Temporal.twapOf(ev).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("x") === ((2L, 400L, 17.5)))
    assert(got("y") === ((1L, 50L, 5.0)))
  }

  test("q284 active users: WAU counts a user once across the window") {
    import spark.implicits._
    // user 1 active days 0-9; users 2 and 3 only day 5. A windowed SUM
    // of daily counts would claim WAU(9) = 7 (u1 seven times); the
    // user-day distinct says 1 + the two day-5 visitors = 3.
    val rows = ((0L to 9L).map(d => (1L, d)) ++ Seq((2L, 5L), (3L, 5L)))
      .toDF("user_id", "day")
    val got = Temporal.activeUsersOf(rows).collect()
      .map(r => r.getDate(0).toLocalDate.toEpochDay ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got.keySet === (0L to 9L).toSet) // anchors 10-11 have no DAU
    assert(got(4L) === ((1L, 1L, 1000000L)))
    assert(got(5L) === ((3L, 3L, 1000000L)))
    (6L to 9L).foreach(d => assert(got(d) === ((1L, 3L, 333333L)), s"day $d"))
  }

  test("q290 co-occurrence: a burst votes once per (user, bucket) cell") {
    import spark.implicits._
    val rows = Seq(
      (1L, "a", 0L), (1L, "a", 0L), (1L, "a", 0L), (1L, "b", 0L),
      (1L, "a", 1L), (1L, "c", 1L),
      (2L, "a", 0L), (2L, "b", 0L)
    ).toDF("user_id", "event_type", "bucket")
    val got = Temporal.cooccurrenceOf(rows).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(("a", "b") -> 2L, ("a", "c") -> 1L))
  }

  test("q291 reciprocity: cycle scores 1e6, funnel 0, self-loops ignored") {
    import spark.implicits._
    val cyc = Seq(("a", "b", 5L), ("b", "a", 3L), ("c", "c", 9L))
      .toDF("from_type", "to_type", "n")
    val r = Temporal.reciprocityOf(cyc).head()
    assert(r.getAs[Long]("n_edges") === 2L)
    assert(r.getAs[Long]("recip_ppm") === 1000000L)
    // weighted: min(5,3) + min(3,5) = 6 of 8 units returnable
    assert(r.getAs[Long]("w_recip_ppm") === 750000L)
    val funnel = Seq(("a", "b", 2L), ("b", "c", 2L), ("a", "c", 1L))
      .toDF("from_type", "to_type", "n")
    val r2 = Temporal.reciprocityOf(funnel).head()
    assert(r2.getAs[Long]("n_recip") === 0L)
    assert(r2.getAs[Long]("w_recip_ppm") === 0L)
  }

  test("q292 sorted neighbors: window w=3 pairs; the distance-4 twin is missed") {
    import spark.implicits._
    // five names, pairwise lev <= 1, in sort order ann < anna < annb <
    // annc < anne. Every pair within 3 positions is found; (ann, anne)
    // at distance 4 is the documented sorted-neighborhood recall loss.
    val rows = Seq((1L, "ann"), (2L, "anna"), (3L, "annb"), (4L, "annc"),
      (5L, "anne")).toDF("key", "name")
    val got = Temporal.sortedNeighborsOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val all = (for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)).toSet
    assert(got === all - ((1L, 5L)))
  }

  test("q293 entry paths: first three steps, short journeys padded") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, "a", 0L), (1L, 2L, "b", 1L), (1L, 3L, "c", 2L),
      (1L, 4L, "d", 3L), // step 4 must not matter
      (2L, 5L, "a", 0L), (2L, 6L, "b", 1L),
      (3L, 7L, "a", 0L),
      (4L, 8L, "a", 5L), (4L, 9L, "b", 6L), (4L, 10L, "c", 7L)
    ).toDF("user_id", "event_id", "event_type", "us")
    val got = Temporal.entryPathsOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got === Array(("a", "b", "c", 2L), ("a", "-", "-", 1L),
      ("a", "b", "-", 1L)))
  }

  test("q294 temporal split: p80 day cut, cold-start user and unseen type counted") {
    import spark.implicits._
    // 10 distinct days -> cut rank (8*10+9) div 10 = 8 -> day 7.
    // u2 appears only on day 8 (cold start); type z only on day 9.
    val rows = ((0L to 9L).map(d => (1L, "x", d)) ++
      Seq((2L, "x", 8L), (3L, "x", 3L), (1L, "z", 9L)))
      .toDF("user_id", "event_type", "day")
    val r = Temporal.splitAuditOf(rows).head()
    assert(r.getAs[Long]("day_cut") === 7L)
    assert(r.getAs[Long]("n_train") === 9L)
    assert(r.getAs[Long]("n_test") === 4L)
    assert(r.getAs[Long]("n_test_users") === 2L)
    assert(r.getAs[Long]("n_unseen_users") === 1L)
    assert(r.getAs[Long]("cold_start_ppm") === 500000L)
    assert(r.getAs[Long]("n_unseen_types") === 1L)
  }

  test("q298 growth accounting: resurrection arc and the retention identity") {
    import spark.implicits._
    // u1 active weeks 1,2,4: new@1, retained@2, churned@3,
    // resurrected@4, churned@5. u2 active 1-5 keeps every week present.
    val rows = (Seq(1L, 2L, 4L).map(w => (1L, w)) ++
      (1L to 5L).map(w => (2L, w))).toDF("user_id", "week")
    val g = Temporal.growthOf(rows).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // (n_active, n_new, n_retained, n_resurrected, n_churned)
    assert(g(1L) === ((2L, 2L, 0L, 0L, 0L)))
    assert(g(2L) === ((2L, 0L, 2L, 0L, 0L)))
    assert(g(3L) === ((1L, 0L, 1L, 0L, 1L)))
    assert(g(4L) === ((2L, 0L, 1L, 1L, 0L)))
    assert(g(5L) === ((1L, 0L, 1L, 0L, 1L)))
    // identities: active = new + retained + resurrected, and
    // retained(w) = active(w-1) - churned(w)
    g.values.foreach { case (a, nw, rt, rs, _) => assert(a === nw + rt + rs) }
    (2L to 5L).foreach(w => assert(g(w)._3 === g(w - 1)._1 - g(w)._5, s"w$w"))
  }

  test("q303 dwell matrix: hand-computed integer mean dwell per hop") {
    import spark.implicits._
    // u1: a@0 -> b@100 -> c@250; u2: a@0 -> b@51.
    // (a,b): n=2, dwell 151, mean 151 div 2 = 75. (b,c): n=1, 150.
    val ev = Seq((1L, 1L, "a", 0L), (1L, 2L, "b", 100L),
      (1L, 3L, "c", 250L), (2L, 4L, "a", 0L), (2L, 5L, "b", 51L))
      .toDF("user_id", "event_id", "event_type", "us")
    val got = Temporal.dwellOf(ev).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got === Map(("a", "b") -> ((2L, 151L, 75L)),
      ("b", "c") -> ((1L, 150L, 150L))))
  }

  test("q307 prefix compression: hand-counted adjacent LCPs") {
    import spark.implicits._
    // sorted: app, apple, apply, zebra -> LCPs 3 (app|apple),
    // 4 (apple|apply), 0 (apply|zebra) = 7 of 18 bytes elidable
    val rows = Seq("apple", "zebra", "app", "apply").toDF("name")
    val r = Temporal.prefixCompressionOf(rows).head()
    assert(r.getAs[Long]("n_keys") === 4L)
    assert(r.getAs[Long]("total_bytes") === 18L)
    assert(r.getAs[Long]("saved_bytes") === 7L)
    assert(r.getAs[Long]("saved_ppm") === 388888L)
  }
}
