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
}
