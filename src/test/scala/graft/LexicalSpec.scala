package graft

import graft.operators.Lexical
import org.apache.spark.sql.functions._

class LexicalSpec extends SparkSpec {
  import spark.implicits._

  test("collocations: lift_ppm re-derives from brute-force counts") {
    val rows = Lexical.collocations(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force the corpus stats driver-side
    val texts = Tables.documents(spark, sf).select("text").collect()
      .map(_.getString(0).toLowerCase)
    val tok = "[a-z0-9]+".r
    val docs = texts.map(t => tok.findAllIn(t).toArray)
    val uni = docs.flatten.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val n = docs.map(_.length.toLong).sum
    val bi = docs.flatMap(t => t.dropRight(1).zip(t.drop(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (nAb, nA, nB, lift) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(nAb === bi((a, b)), s"n_ab($a,$b)")
      assert(nA === uni(a) && nB === uni(b), s"n_a/n_b($a,$b)")
      assert(nAb >= 5)
      assert(lift ===
        (BigInt(nAb) * BigInt(n) * 1000000) / (BigInt(nA) * BigInt(nB)),
        s"lift($a,$b)")
    }
    // ordering: lift desc with full (a, b) tiebreak
    val key = rows.map(r => (-r.getLong(5), r.getString(0), r.getString(1)))
    assert(key.sameElements(key.sorted))
  }

  test("vocabDrift: drift re-derives from brute-force half-corpus counts") {
    val rows = Lexical.vocabDrift(spark, sf).collect()
    assert(rows.nonEmpty)
    val tok = "[a-z0-9]+".r
    def counts(parity: Int): Map[String, Long] =
      Tables.documents(spark, sf)
        .filter(col("doc_id") % 2 === parity).select("text").collect()
        .flatMap(r => tok.findAllIn(r.getString(0).toLowerCase))
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val (ca, cb) = (counts(0), counts(1))
    val (na, nb) = (ca.values.sum, cb.values.sum)
    rows.foreach { r =>
      val w = r.getString(0)
      assert(r.getLong(1) === ca.getOrElse(w, 0L))
      assert(r.getLong(2) === cb.getOrElse(w, 0L))
      val drift = (BigInt(ca.getOrElse(w, 0L)) * nb -
        BigInt(cb.getOrElse(w, 0L)) * na).abs
      // ranked in exact decimal, EMITTED as BIGINT (in-range at any
      // benched scale) — the brute-force BigInt must equal it exactly
      assert(BigInt(r.getLong(3)) === drift, s"drift($w)")
    }
    // descending with full tiebreak
    val key = rows.map(r => (BigInt(r.getLong(3)), r.getString(0)))
    assert(key.sameElements(key.sortBy { case (d, w) => (-d, w) }))
  }

  test("collocations: a planted rare-word bigram dominates by lift") {
    val docs = (Seq.fill(6)("zq xw common words here") ++
      Seq.fill(40)("common words appear again and again and again"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val rows = Lexical.collocationsFrom(docs, "text", minCount = 5L, k = 10)
      .collect()
    assert(rows.head.getString(0) === "zq" && rows.head.getString(1) === "xw")
    // zq/xw each occur 6 times, always together: lift = N/6 * 1e6 ppm
    val n = 6L * 5 + 40L * 8
    assert(rows.head.getLong(5) === 1000000L * n / 6)
    assert(rows.map(r => (r.getString(0), r.getString(1)))
      .contains(("common", "words")))
  }
}
