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
}
