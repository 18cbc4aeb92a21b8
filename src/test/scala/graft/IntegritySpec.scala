package graft

import graft.operators.{Dedup, Integrity}
import graft.plans.GraftFunctions
import org.apache.spark.sql.functions._

class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("tableFingerprint: signature is invariant under row order") {
    val base = Integrity.tableFingerprint(spark, sf).collect()
    // same rows, violently reordered and repartitioned upstream: the
    // aggregate must not care (that is the whole point of the operator)
    val d2 = Tables.documents(spark, sf)
      .orderBy(rand(7)).repartition(13).localCheckpoint(true)
    def enc(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("0")).otherwise(concat(lit("1"), c))
    val repr = concat_ws("\u0001",
      enc(col("doc_id").cast("long").cast("string")), enc(col("lang")),
      enc(col("source")), enc(col("n_chars").cast("long").cast("string")),
      enc(col("text")))
    val h = conv(substring(md5(repr.cast("binary")), 1, 15), 16, 10).cast("long")
    val again = d2.select(col("lang"), h.as("h"))
      .rollup("lang")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).as("sum_sig"),
        expr("bit_xor(h)").as("xor_sig"))
      .orderBy(col("lang").asc_nulls_first).collect()
    assert(base.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("tableFingerprint: a single flipped row changes both signatures") {
    val rows = Integrity.tableFingerprint(spark, sf).collect()
    val total = rows.find(_.isNullAt(0)).get
    // recompute with one doc's text perturbed
    val perturbed = Tables.documents(spark, sf)
      .withColumn("text",
        when(col("doc_id") === 1, concat(col("text"), lit("!"))).otherwise(col("text")))
    def enc(c: org.apache.spark.sql.Column) =
      when(c.isNull, lit("0")).otherwise(concat(lit("1"), c))
    val repr = concat_ws("\u0001",
      enc(col("doc_id").cast("long").cast("string")), enc(col("lang")),
      enc(col("source")), enc(col("n_chars").cast("long").cast("string")),
      enc(col("text")))
    val h = conv(substring(md5(repr.cast("binary")), 1, 15), 16, 10).cast("long")
    val t2 = perturbed.select(h.as("h"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("h").cast("decimal(38,0)")).as("sum_sig"),
        expr("bit_xor(h)").as("xor_sig")).collect().head
    assert(t2.getLong(0) === total.getLong(1))
    // sum_sig is emitted as its canonical decimal string (decimal128
    // must not reach the gate's final schema) — compare via string form
    assert(t2.getDecimal(1).toBigInteger.toString !== total.getString(2))
    assert(t2.getLong(2) !== total.getLong(3))
  }

  test("bloomDecontaminate: equals the bloom-free exact anti-join") {
    val got = Integrity.bloomDecontaminate(spark, sf).collect()
    val docs = Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val benchSet = Dedup.shingleTable(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 5)
      .select("h64").distinct()
    val bad = Dedup.shingleTable(corpus, "doc_id", "text", 5)
      .join(benchSet, Seq("h64"), "left_semi")
      .select("doc_id").distinct()
    val expect = corpus.join(bad, Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").cast("long").as("n_chars"))
      .orderBy("lang").collect()
    assert(got.map(_.toString).toSeq === expect.map(_.toString).toSeq)
    assert(got.nonEmpty)
  }

  test("bloom prefilter: flags every true hit and only an fpp-bounded sliver") {
    val docs = Tables.documents(spark, sf)
    val benchSet = Dedup.shingleTable(
        docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 5)
      .select("h64").distinct().localCheckpoint(true)
    val bf = lit(benchSet
      .agg(GraftFunctions.bloom_agg(col("h64"), 1L << 20, 1L << 24))
      .head().getAs[Array[Byte]](0))
    val corpusSh = Dedup.shingleTable(
        docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text", 5)
      .localCheckpoint(true)
    val flagged = corpusSh.filter(GraftFunctions.might_contain(bf, col("h64")))
    val trueHits = corpusSh.join(benchSet, Seq("h64"), "left_semi")
    // no false negatives, ever
    assert(trueHits.join(flagged.select("h64").distinct(), Seq("h64"), "left_anti")
      .count() === 0L)
    // the sliver: flagged is a small fraction of the corpus shingles
    // (true overlap + fpp; the planted corpus overlap is itself sparse)
    val (nFlag, nAll) = (flagged.count(), corpusSh.count())
    assert(nFlag < nAll / 2, s"flagged $nFlag of $nAll")
  }

  test("q305 cascade delete: zero orphans and exact conservation per table") {
    val r = Integrity.cascadeDeleteAudit(spark, sf).head()
    // the audit's whole point: the remainder is referentially intact
    assert(r.getAs[Long]("n_orphan_orders") === 0L)
    assert(r.getAs[Long]("n_orphan_lineitems") === 0L)
    // conservation + independent recomputation of the deletion list
    val doomedCust = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 97 === 0).count()
    assert(r.getAs[Long]("n_deleted_customers") === doomedCust)
    val doomedOrders = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 97 === 0).count() // FK = custkey domain
    assert(r.getAs[Long]("n_deleted_orders") === doomedOrders)
    assert(r.getAs[Long]("n_deleted_customers") <= r.getAs[Long]("n_customers"))
    assert(r.getAs[Long]("n_deleted_lineitems") <= r.getAs[Long]("n_lineitems"))
    assert(doomedCust > 0L, "fixture degenerate: empty deletion list")
  }

  test("q306 reconciliation equals a driver BigDecimal recomputation") {
    import scala.math.BigDecimal.RoundingMode.HALF_UP
    def cents(d: Double): BigDecimal =
      BigDecimal(d).setScale(2, HALF_UP) * 100
    val lineCents = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_extendedprice").collect()
      .map(r => r.getLong(0) -> cents(r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").collect()
      .map(r => (cents(r.getDouble(1)),
        lineCents.getOrElse(r.getLong(0), BigDecimal(0))))
    val r = Integrity.orderReconciliation(spark, sf).head()
    assert(r.getAs[Long]("n_orders") === orders.length.toLong)
    assert(r.getAs[Long]("n_over") === orders.count(t => t._1 > t._2).toLong)
    assert(r.getAs[Long]("n_exact") === orders.count(t => t._1 == t._2).toLong)
    assert(r.getAs[Long]("n_under") === orders.count(t => t._1 < t._2).toLong)
    assert(r.getAs[Long]("abs_diff_cents") ===
      orders.map(t => (t._1 - t._2).abs).sum.toLong)
  }
}
