package graft

import graft.operators.Golden
import graft.sources.GoldenFixture
import graft.sources.GoldenFixture.Tx
import java.time.LocalDate

/** End-to-end drive of the reference's 22-column CSV contract: the
  * fixture generator's in-memory rows are replayed in plain Scala
  * (BigDecimal arithmetic, no Spark) to compute independent golden
  * values, and every one of the reference's six queries must match them
  * exactly after the full CSV ingest (drifting schemas, placeholder
  * tokens, decimal-comma money). */
class GoldenSliceSpec extends SparkSpec {

  private lazy val fx = GoldenFixture.generate("/tmp/graft_golden_spec")
  private lazy val tx = Golden.loadTransactions(spark, fx)
    .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  private lazy val prod = Golden.loadProducts(spark, fx)

  private def sigTrue(t: Tx): Boolean =
    fx.products.get(t.ref).exists(_.contains(true))

  test("ingest: all rows survive, duplicates preserved, drift filled with nulls") {
    assert(tx.count() === fx.rows.size) // d1 1205 + d2 800 + d3 ~2573
    // data2 rows (no Numero_TPV column) have null numero_tpv
    val d2 = fx.rows.count(_.tpv.isEmpty)
    assert(tx.filter(tx("numero_tpv").isNull).count() === d2)
    // the planted golden counts hold in the in-memory replay: exactly
    // 76 duplicate groups on the reference's 15-col business key and
    // exactly 2020 missing CA_Net_TTC (all in data3 by construction)
    assert(fx.rows.groupBy(GoldenFixture.bizKey).count(_._2.size > 1)
      === GoldenFixture.TargetDupGroups)
    assert(fx.rows.count(_.ttc.isEmpty) === GoldenFixture.TargetNoValueCa)
  }

  test("timeframe matches the replayed golden values") {
    val exp = (fx.rows.map(_.date).max, fx.rows.map(_.date).min)
    val r = Golden.timeframe(tx).head
    assert(r.getDate(0).toLocalDate === exp._1)
    assert(r.getDate(1).toLocalDate === exp._2)
  }

  test("revenue per day matches exactly (decimal sums, #NO VALUE skipped)") {
    val exp: Map[LocalDate, BigDecimal] = fx.rows.groupBy(_.date)
      .map { case (d, rs) => d -> rs.flatMap(_.ttc).sum }
    val got = Golden.revenuePerDay(tx).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val d = r.getDate(0).toLocalDate
      assert(BigDecimal(r.getDouble(1)) === BigDecimal(exp(d).toDouble), s"day $d")
    }
  }

  test("top-10 products by units matches the replay") {
    val exp = fx.rows.groupBy(_.ref)
      .map { case (k, rs) => k -> rs.map(_.qty.toLong).sum }.toSeq
      .sortBy { case (k, v) => (-v, k) }.take(10)
    val got = Golden.top10Products(tx).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === exp)
  }

  test("transactions per store: COUNT vs COUNT DISTINCT diverge and match replay") {
    val exp = fx.rows.groupBy(_.pdv).map { case (k, rs) =>
      k -> ((rs.map(_.tid).distinct.size.toLong, rs.size.toLong))
    }
    val got = Golden.txPerStore(tx).collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val (d, c) = exp(r.getString(0))
      assert(r.getLong(1) === d && r.getLong(2) === c, r.getString(0))
    }
    // the divergence the fixture plants: at least one store has repeats
    assert(got.exists(r => r.getLong(2) > r.getLong(1)))
  }

  test("flagship margin lands exactly on the planted 49264.014260") {
    val got = Golden.margin2M(tx, prod).head.getDouble(0)
    assert(BigDecimal(got) === BigDecimal(GoldenFixture.TargetMargin2M.toDouble))
  }

  test("60-day margin differs from the calendar window and matches replay") {
    val mx = fx.rows.map(_.date).max
    val from = mx.minusDays(60)
    val exp = fx.rows.filter(t => sigTrue(t) &&
        !t.date.isBefore(from) && !t.date.isAfter(mx))
      .map(_.marge).sum
    val got = Golden.margin60d(tx, prod).head.getDouble(0)
    assert(BigDecimal(got) === BigDecimal(exp.toDouble))
    assert(got !== GoldenFixture.TargetMargin2M.toDouble)
  }

  test("placeholder mining rediscovers each file's null-token dialect") {
    val got = Golden.placeholderMining(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // data3 spells nulls '#NO VALUE' across all 4 audited columns;
    // data2 uses 'na' (fidelite) and '-' (univers/segment)
    assert(got.keySet === Set("#no value", "-", "na"))
    assert(got("#no value") === ((1L, 4L)))
    assert(got("-") === ((1L, 2L)))
    assert(got("na") === ((1L, 1L)))
  }

  test("product dimension via XLSX equals the CSV-loaded dimension (reference Excel path)") {
    val fromXlsx = prod // Golden.loadProducts reads the .xlsx now
    val fromCsv = graft.sources.CsvSource.alignTo(
      graft.sources.CsvSource.readRaw(spark, fx.productPath),
      graft.model.ReferenceSchemas.product)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), Option(r.get(1)))).toSet
    assert(rows(fromXlsx) === rows(fromCsv))
    assert(rows(fromXlsx).size === 300)
  }

  test("q51 golden counts rediscover the planted 76 groups and 2020 #NO VALUE") {
    val r = Golden.goldenCounts(spark, sf).head
    assert(r.getLong(0) === GoldenFixture.TargetDupGroups.toLong)
    assert(r.getLong(1) === GoldenFixture.TargetDupGroups.toLong * 2,
      "every planted group has exactly 2 members")
    assert(r.getLong(2) === GoldenFixture.TargetNoValueCa.toLong)
  }

  test("q35 summary is consistent with its parts") {
    val r = Golden.summary(spark, sf).head
    assert(r.getDate(0).toLocalDate === fx.rows.map(_.date).min)
    assert(r.getDate(1).toLocalDate === fx.rows.map(_.date).max)
    assert(BigDecimal(r.getDouble(2)) === BigDecimal(GoldenFixture.TargetMargin2M.toDouble))
    assert(r.getLong(5) === fx.rows.map(_.tid).distinct.size.toLong)
  }
}
