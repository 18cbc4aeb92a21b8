package graft

import graft.operators.Robust
import org.apache.spark.sql.functions._

/** Closed-form laws for the robust-statistics batch (q246–q251): each
  * operator is checked against a hand-computable planted fixture, so
  * the oracle gate proves cross-engine agreement and these prove the
  * STATISTIC is the advertised one. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  test("q246 Mann-Whitney: identical samples give AUC exactly 1/2") {
    val t = Seq.tabulate(40)(i => ("src1", (i % 7).toLong)) ++
      Seq.tabulate(40)(i => ("src2", (i % 7).toLong))
    val r = Robust.mannWhitneyOf(t.toDF("source", "tc")).head()
    assert(r.getAs[Long]("n1") === 40L && r.getAs[Long]("n2") === 40L)
    // identical distributions: U1 = n1*n2/2 exactly (midranks symmetric)
    assert(r.getAs[Long]("u2x") === 40L * 40 /* 2*U1 = n1*n2 */)
    assert(r.getAs[Long]("auc_ppm") === 500000L)
  }

  test("q246 Mann-Whitney: fully separated samples give AUC 0 and 1e6") {
    val lo = Seq.tabulate(10)(i => ("src1", i.toLong))
    val hi = Seq.tabulate(10)(i => ("src2", 100L + i))
    val r1 = Robust.mannWhitneyOf((lo ++ hi).toDF("source", "tc")).head()
    // every src1 value below every src2 value: U1 = 0
    assert(r1.getAs[Long]("u2x") === 0L)
    assert(r1.getAs[Long]("auc_ppm") === 0L)
    val swapped = lo.map { case (_, v) => ("src2", v) } ++
      hi.map { case (_, v) => ("src1", v) }
    val r2 = Robust.mannWhitneyOf(swapped.toDF("source", "tc")).head()
    assert(r2.getAs[Long]("auc_ppm") === 1000000L)
  }

  test("q247 Theil-Sen: planted linear daily counts recover the exact slope") {
    // day d carries 10 + 3*d events: every pairwise slope is exactly 3
    val days = for (d <- 0L until 12L; _ <- 0L until (10 + 3 * d)) yield d
    val r = Robust.theilSenOf(days.toDF("day")).head()
    assert(r.getAs[Long]("slope_ppm") === 3000000L)
    assert(r.getAs[Long]("n_days") === 12L)
    assert(r.getAs[Long]("n_pairs") === 12L * 11 / 2)
  }

  test("q247 Theil-Sen: one outlier day cannot move the median slope") {
    val days = (for (d <- 0L until 12L; _ <- 0L until (10 + 3 * d)) yield d) ++
      Seq.fill(500)(6L) // day 6 explodes; most pairs still slope 3
    val r = Robust.theilSenOf(days.toDF("day")).head()
    assert(r.getAs[Long]("slope_ppm") === 3000000L,
      s"outlier day dragged the robust slope: ${r.getAs[Long]("slope_ppm")}")
  }

  test("q250 MAD: planted spike day is counted and located") {
    // counts: day1=3, day2=2, day3..5=1 -> med=1, deviations sorted
    // (0,0,0,1,2) -> mad=0, anomalies = {day1, day2}, worst = day1
    val days = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L, 5L)
    val r = Robust.madOf(days.toDF("day")).head()
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("med_cnt") === 1L)
    assert(r.getAs[Long]("mad") === 0L)
    assert(r.getAs[Long]("n_anomalies") === 2L)
    assert(r.getAs[Long]("max_dev_day") === 1L)
    assert(r.getAs[Long]("max_dev") === 2L)
  }

  test("q248 collocations: planted repeated phrase tops the lift ranking") {
    val docs = Tables.documents(spark, sf)
    val out = Robust.collocations(spark, sf).collect()
    assert(out.length === 15)
    // lift is genuinely ordered and ties broken lexicographically
    val lifts = out.map(_.getAs[Long]("lift_ppm")).toSeq
    assert(lifts === lifts.sorted.reverse)
    // every reported pair meets the support floor
    assert(out.forall(_.getAs[Long]("c_ab") >= 5L))
    assert(docs.count() > 0)
  }

  test("q249 vocab growth: quartile counts are monotone and bounded") {
    val rows = Robust.vocabGrowth(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (a, b, c, t) = (r.getAs[Long]("q25_terms"), r.getAs[Long]("q50_terms"),
        r.getAs[Long]("q75_terms"), r.getAs[Long]("total_terms"))
      assert(a >= 1 && a <= b && b <= c && c <= t,
        s"non-monotone growth for ${r.getAs[String]("source")}: $a $b $c $t")
      // natural text: the first quarter of docs must NOT contribute a
      // quarter-linear share of the vocabulary only (Heaps sublinearity
      // means well over 25% of terms appear early)
      assert(a * 2 > t / 2, s"suspiciously linear vocabulary growth: $a vs $t")
    }
  }

  test("q251 Benford: shares sum to the whole corpus and ppm channel is exact") {
    val rows = Robust.benford(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("digit")).toSeq === (1L to 9L))
    val n = rows.map(_.getAs[Long]("o")).sum
    assert(n === Tables.orders(spark, sf).count())
    assert(rows.map(_.getAs[Long]("e_ppm")).sum === 1000000L)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ===
        r.getAs[Long]("o_ppm") - r.getAs[Long]("e_ppm"))
    }
  }

  test("q254 CUSUM: hand-computed spike frame matches exactly") {
    // counts per day: (5,5,8,5,5) -> k = positional median 5,
    // P = (0,0,3,3,3), up = P - runmin = (0,0,3,3,3), down = runmax - P = 0
    val days = (0L to 4L).flatMap(d =>
      Seq.fill(if (d == 2L) 8 else 5)(d))
    val rows = Robust.cusumOf(days.toDF("day")).collect()
    assert(rows.map(r => (r.getAs[Long]("day"), r.getAs[Long]("cnt"),
      r.getAs[Long]("cusum_up"), r.getAs[Long]("cusum_down"))).toSeq ===
      Seq((0L, 5L, 0L, 0L), (1L, 5L, 0L, 0L), (2L, 8L, 3L, 0L),
        (3L, 5L, 3L, 0L), (4L, 5L, 3L, 0L)))
    assert(rows.forall(_.getAs[Long]("k") === 5L))
  }

  test("q254 CUSUM: sustained small shift ramps while MAD stays silent") {
    // 20 days alternating 9/11, then 20 days alternating 10/12: every
    // per-day deviation is within 2 of the median (MAD threshold 5·mad
    // = 5 never trips), but the +1 mean shift accumulates in CUSUM.
    val counts = (0 until 20).map(d => if (d % 2 == 0) 9 else 11) ++
      (20 until 40).map(d => if (d % 2 == 0) 10 else 12)
    val days = counts.zipWithIndex.flatMap { case (c, d) =>
      Seq.fill(c)(d.toLong) }
    val mad = Robust.madOf(days.toDF("day")).head()
    assert(mad.getAs[Long]("n_anomalies") === 0L,
      "MAD flagged the gradual shift — fixture broken")
    val rows = Robust.cusumOf(days.toDF("day")).collect()
    val finalUp = rows.maxBy(_.getAs[Long]("day")).getAs[Long]("cusum_up")
    assert(finalUp >= 15L,
      s"CUSUM failed to accumulate the sustained shift: $finalUp")
  }

  test("q255 Spearman: concordant series hit +1e6, reversed hit -1e6") {
    // series a: day d has d+1 events; series b: 2(d+1) (same order)
    val a = (0L until 10L).flatMap(d => Seq.fill((d + 1).toInt)(d))
    val b = (0L until 10L).flatMap(d => Seq.fill(2 * (d + 1).toInt)(d))
    val r1 = Robust.spearmanOf(a.toDF("day"), b.toDF("day")).head()
    assert(r1.getAs[Long]("n_days") === 10L)
    assert(r1.getAs[Long]("rho2_ppm") === 1000000L)
    // reversed: day d carries what day 9-d carried
    val brev = (0L until 10L).flatMap(d => Seq.fill(2 * (10 - d).toInt)(d))
    val r2 = Robust.spearmanOf(a.toDF("day"), brev.toDF("day")).head()
    assert(r2.getAs[Long]("rho2_ppm") === -1000000L)
  }

  test("q256 lambda: perfect prediction gives 1e6, independence gives 0") {
    val perfect = Seq.tabulate(30)(i => (s"s${i % 3}", s"L${i % 3}"))
    val r1 = Robust.gkLambdaOf(perfect.toDF("source", "lang")).head()
    assert(r1.getAs[Long]("lambda_ppm") === 1000000L)
    // two sources, identical lang mix {A:4, B:2}: knowing the source
    // never improves the modal guess
    val indep = (Seq.fill(4)(("s1", "A")) ++ Seq.fill(2)(("s1", "B")) ++
      Seq.fill(4)(("s2", "A")) ++ Seq.fill(2)(("s2", "B")))
    val r2 = Robust.gkLambdaOf(indep.toDF("source", "lang")).head()
    assert(r2.getAs[Long]("lambda_ppm") === 0L)
  }

  test("q257 Fano: constant feed scores 0, one-day burst scores total·1e6") {
    // type A: 4/day for 5 days (establishes the day frame);
    // type B: all 20 events on day 0
    val t = (0L until 5L).flatMap(d => Seq.fill(4)((d, "A"))) ++
      Seq.fill(20)((0L, "B"))
    val rows = Robust.fanoOf(t.toDF("day", "event_type")).collect()
    val byType = rows.map(r =>
      r.getAs[String]("event_type") -> r.getAs[Long]("fano_ppm")).toMap
    assert(byType("A") === 0L)
    // F = (n·T² − T²)/((n−1)·T) = T: 20 → 20,000,000 ppm
    assert(byType("B") === 20000000L)
    assert(rows.forall(_.getAs[Long]("n_days") === 5L))
  }

  test("q260 DOW profile: planted weekly pattern recovered exactly") {
    // two full weeks; day d carries 10 + 2·dow events (dow = (d+4)%7)
    // -> per weekday both observations equal the median, residual 0
    val days = (0L until 14L).flatMap(d =>
      Seq.fill((10 + 2 * ((d + 4) % 7)).toInt)(d))
    val rows = Robust.dowOf(days.toDF("day")).collect()
    assert(rows.length === 7)
    rows.foreach { r =>
      val dow = r.getAs[Long]("dow")
      assert(r.getAs[Long]("med") === 10L + 2 * dow)
      assert(r.getAs[Long]("n_days") === 2L)
      assert(r.getAs[Long]("max_resid") === 0L)
    }
  }

  test("q261 sliced AUC exposes a cancellation the global AUC hides") {
    // slice X: src1 strictly shorter (AUC 0); slice Y: the mirror
    // (AUC 1e6). Globally the multisets are identical -> AUC exactly 1/2.
    val x = Seq(("X", "src1", 1L), ("X", "src1", 2L),
      ("X", "src2", 10L), ("X", "src2", 11L))
    val y = Seq(("Y", "src1", 10L), ("Y", "src1", 11L),
      ("Y", "src2", 1L), ("Y", "src2", 2L))
    val t = (x ++ y).toDF("slice", "source", "tc")
    val sliced = Robust.aucBySliceOf(t).collect()
      .map(r => r.getAs[String]("slice") -> r.getAs[Long]("auc_ppm")).toMap
    assert(sliced === Map("X" -> 0L, "Y" -> 1000000L))
    val global = Robust.mannWhitneyOf(t.select("source", "tc")).head()
    assert(global.getAs[Long]("auc_ppm") === 500000L,
      "fixture broken: global AUC should cancel to exactly 1/2")
  }

  test("q263 Kendall tau-b: concordant, reversed, and tied fixtures") {
    // series a: day d gets d+1 clicks; series b concordant (2d+1 views)
    def obs(f: Long => Long) =
      (0L until 6L).flatMap(d => Seq.fill(f(d).toInt)(d)).toDF("day")
    val conc = Robust.kendallOf(obs(_ + 1), obs(d => 2 * d + 1)).head()
    assert(conc.getAs[Long]("n_pairs") === 15L)
    assert(conc.getAs[Long]("concordant") === 15L)
    assert(conc.getAs[Long]("discordant") === 0L)
    assert(conc.getAs[Long]("tau2_ppm") === 1000000L)

    // reversed: b runs 6-d views per day -> every pair discordant
    val rev = Robust.kendallOf(obs(_ + 1), obs(d => 6 - d)).head()
    assert(rev.getAs[Long]("discordant") === 15L)
    assert(rev.getAs[Long]("tau2_ppm") === -1000000L)

    // ties: a constant (all 15 pairs tied in x) -> tau undefined-free
    // path not exercised; instead tie HALF of a: days 0..2 get 5
    // clicks each (3 tied pairs in x), b stays strictly increasing
    val halfTied = Robust.kendallOf(
      obs(d => if (d < 3) 5 else d + 10), obs(d => 2 * d + 1)).head()
    assert(halfTied.getAs[Long]("ties_x") === 3L)
    assert(halfTied.getAs[Long]("ties_y") === 0L)
    // tau-b with the tie correction: C=12, D=0, n0=15, tx=3, ty=0
    // -> tau² = 144/(12*15) = 0.8 exactly
    assert(halfTied.getAs[Long]("concordant") === 12L)
    assert(halfTied.getAs[Long]("tau2_ppm") === 800000L)
  }

  test("q272 weighted median: a fat weight drags it off the row median") {
    import spark.implicits._
    // values 1..9 weight 1, plus value 9 with weight 100:
    // row median = 5, weighted median = 9 (2*cw >= W first at v=9)
    val t = ((1L to 9L).map(v => ("g", 1L, v)) :+ (("g", 100L, 9L)))
      .toDF("grp", "wt", "v")
    val r = Robust.weightedMedianOf(t).head()
    assert(r.getAs[Long]("weighted_median") === 9L)
    assert(r.getAs[Long]("total_weight") === 109L)
    // uniform weights reduce to the positional lower median
    val u = (1L to 9L).map(v => ("u", 1L, v)).toDF("grp", "wt", "v")
    assert(Robust.weightedMedianOf(u).head()
      .getAs[Long]("weighted_median") === 5L)
  }

  test("q276 seasonal MAD flags the in-season anomaly raw MAD misses") {
    import spark.implicits._
    // 35 days of strong weekly pattern 20 + 10*dow (values 20..80);
    // day 17 (dow 0, expected 20) carries 50 — inside the overall
    // 20..80 spread (raw MAD silent) but 30 off its weekday level
    def cnt(d: Long): Long = 20 + 10 * ((d + 4) % 7)
    val obs = (0L until 35L).flatMap { d =>
      val c = if (d == 17) 50L else cnt(d)
      Seq.fill(c.toInt)(d)
    }.toDF("day")
    val raw = Robust.madOf(obs).head()
    assert(raw.getAs[Long]("n_anomalies") === 0L,
      s"fixture broken: raw MAD flagged the in-season day: $raw")
    val seas = Robust.seasonalMadOf(obs).head()
    assert(seas.getAs[Long]("n_anomalies") >= 1L,
      s"seasonal MAD missed the weekday-wrong day: $seas")
    assert(seas.getAs[Long]("max_dev_day") === 17L)
  }

  test("q286 zipf: perfect C div r curve reads C back; bucketing exact") {
    import spark.implicits._
    // f = 1000 div r at ranks 1..10: one token per decile, and
    // mean_rf = r * (1000 div r) exactly (998-1000 band)
    val perfect = (1L to 10L).map(r => (1000L / r, r)).toDF("f", "r")
    val got = graft.operators.Llm.zipfOf(perfect, 10L).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("mean_rf")))).toMap
    assert(got.keySet === (1L to 10L).toSet)
    assert(got(1L) === ((1L, 1000L)))
    assert(got(3L) === ((1L, 999L)))   // 3 * 333
    assert(got(7L) === ((1L, 994L)))   // 7 * 142
    // 20 ranks -> 2 per decile; decile 1 mean = (1*20 + 2*19) div 2
    val linear = (1L to 20L).map(r => (21L - r, r)).toDF("f", "r")
    val g2 = graft.operators.Llm.zipfOf(linear, 20L).collect()
      .map(r => r.getAs[Long]("decile") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("mean_rf")))).toMap
    assert(g2.values.forall(_._1 === 2L))
    assert(g2(1L) === ((2L, 29L)))
  }
}
