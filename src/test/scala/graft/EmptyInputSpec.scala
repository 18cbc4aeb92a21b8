package graft

import graft.operators.{Pipeline, Retail, Temporal}
import java.nio.file.Files

/** ADVICE r6 #1: driver-scalar operators (bounds/fences computed via a
  * one-row `.head()` aggregate) must return an EMPTY frame when the
  * filtered input is empty — not NPE on the null aggregate row. The
  * fixture is a scale-factor directory whose tables have the real
  * schemas but zero rows, which is exactly what a first-match-nothing
  * filter produces at any scale.
  */
class EmptyInputSpec extends SparkSpec {

  private lazy val emptySf: String = {
    val dir = Files.createTempDirectory("graft_empty_sf").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath
    // raw read (ts stays the nanos BIGINT the driver writes) so the
    // empty twin round-trips through the same Tables.events branch
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$p/events.parquet")
    spark.read.parquet(s"$sf/lineitem.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$p/lineitem.parquet")
    spark.read.parquet(s"$sf/part.parquet")
      .write.mode("overwrite").parquet(s"$p/part.parquet")
    p
  }

  test("rollingActiveUsers: empty events -> empty frame, stable schema") {
    val out = Temporal.rollingActiveUsers(spark, emptySf)
    assert(out.columns.toSeq === Seq("day_num", "n_users_7d"))
    assert(out.count() === 0L)
  }

  test("iqrTrim: empty lineitem -> empty frame, stable schema") {
    val out = Pipeline.iqrTrim(spark, emptySf)
    assert(out.columns.toSeq === Seq("n_kept", "n_trimmed", "kept_revenue"))
    assert(out.count() === 0L)
  }

  test("madOutliers: empty lineitem -> SQL-shaped 1-row aggregate (count 0, NULL stats)") {
    val out = Pipeline.madOutliers(spark, emptySf)
    assert(out.columns.toSeq === Seq("n_orders", "n_outliers", "med", "mad"))
    val r = out.collect()(0)
    assert(r.getLong(0) === 0L)
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("retail window anchors: empty lineitem -> 1-row aggregate, no NPE") {
    val m2 = Retail.totalMarginLast2Months(spark, emptySf).collect()(0)
    assert(m2.isNullAt(0)) // SUM over empty is NULL
    val d60 = Retail.totalMarginLast60Days(spark, emptySf).collect()(0)
    assert(d60.getDouble(0) === 0.0) // published COALESCE(SUM, 0)
  }

  test("non-empty paths unaffected: both still produce rows on sf0.001") {
    assert(Temporal.rollingActiveUsers(spark, sf).count() > 0L)
    assert(Pipeline.iqrTrim(spark, sf).count() === 1L)
  }

  private lazy val emptyDocsSf: String = {
    val dir = Files.createTempDirectory("graft_empty_docs_sf").toFile
    dir.deleteOnExit()
    val p = dir.getAbsolutePath
    spark.read.parquet(s"$sf/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$p/documents.parquet")
    p
  }

  test("curatedWrite: empty corpus -> empty fingerprint, no write-path NPE") {
    val out = graft.operators.Curation.curatedWrite(spark, emptyDocsSf)
    assert(out.columns.toSeq ===
      Seq("split", "n_docs", "n_tokens", "id_hash_sum", "n_packs"))
    assert(out.count() === 0L)
  }

  test("incrementalCuration: empty corpus -> empty frame, stable schema") {
    val out = graft.operators.Curation.incrementalCuration(spark, emptyDocsSf)
    assert(out.columns.toSeq === Seq("split", "n_docs", "id_hash_sum"))
    assert(out.count() === 0L)
  }

  test("event-analytics block: empty events -> zero-stage funnels, " +
    "empty frames, no NPE") {
    val funnel = Temporal.conversionFunnel(spark, emptySf).collect()
    assert(funnel.length === 3 && funnel.forall(_.getLong(1) === 0L))
    val sFunnel = Temporal.sessionFunnel(spark, emptySf).collect()
    assert(sFunnel.length === 3 && sFunnel.forall(_.getLong(1) === 0L))
    assert(Temporal.retentionCohorts(spark, emptySf).count() === 0L)
    assert(Temporal.eventTransitions(spark, emptySf).count() === 0L)
    assert(Temporal.runningBalance(spark, emptySf).count() === 0L)
    assert(Temporal.gapQuantiles(spark, emptySf).count() === 0L)
    assert(Temporal.locfImpute(spark, emptySf).count() === 0L)
  }

  test("graph features: empty lineitem -> empty frames, no NPE") {
    assert(graft.operators.Graph.twoHopReach(spark, emptySf).count() === 0L)
    assert(graft.operators.Graph.labelPropagation(spark, emptySf).count() === 0L)
  }
}
