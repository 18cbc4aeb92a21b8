package graft

import graft.operators.TextQuality
import org.apache.spark.sql.functions._

class TextQualitySpec extends SparkSpec {
  import spark.implicits._

  test("dropRepeatedLines strips cross-doc boilerplate, keeps order, empties fully-duplicated pages") {
    val banner = "accept cookies to continue"
    val pages = Seq(
      (1L, s"unique alpha\n$banner\nunique beta"),
      (2L, s"$banner\nunique gamma"),
      (3L, banner)) // every line of page 3 is boilerplate
      .toDF("page_id", "text")
    val got = graft.operators.TextQuality
      .dropRepeatedLines(pages, "page_id", "text", maxDf = 1)
      .orderBy("page_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got(0) === ((1L, 3L, 2L, "unique alpha\nunique beta"))) // order kept
    assert(got(1) === ((2L, 2L, 1L, "unique gamma")))
    assert(got(2) === ((3L, 1L, 0L, ""))) // page survives with empty text
  }

  test("redactPii replaces emails, phones, and IPv4s everywhere they occur") {
    val got = Seq(
        "mail a.b+c@x-mail.co.uk or bob@y.io, dial 12-345-678-9012, host 192.168.0.1",
        "no pii here")
      .toDF("t").select(TextQuality.redactPii(col("t"))).as[String].collect()
    assert(got(0) ===
      "mail <EMAIL> or <EMAIL>, dial <PHONE>, host <IP>")
    assert(got(1) === "no pii here")
  }

  test("quality signals: degenerate repetition fails keep, healthy prose passes") {
    val healthy = "The quick brown fox jumps over the lazy dog and it was fine."
    val degenerate = Array.fill(40)("spam").mkString(" ")
    Seq((1L, healthy), (2L, degenerate)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet("/tmp/graft_tq_docs/documents.parquet")
    val got = graft.operators.TextQuality
      .qualitySignals(spark, "/tmp/graft_tq_docs").collect()
    assert(got(0).getBoolean(7), "healthy prose must pass keep")
    assert(got(0).getBoolean(6), "healthy prose ends with punctuation")
    assert(got(0).getDouble(5) > 0.7, "healthy prose: mostly distinct words")
    assert(!got(1).getBoolean(7), "40x 'spam' must fail keep")
    assert(got(1).getDouble(5) < 0.1, "degenerate distinct_word_frac collapses")
  }

  test("repetition stats find the planted dominant bigram") {
    // "ha ha ha ha" -> bigram "ha ha" occurs 3 times out of 3 bigrams
    val docs = Seq((1L, "ha ha ha ha"), (2L, "one two three four"))
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet("/tmp/graft_tq_docs/documents.parquet")
    val got = TextQuality.repetitionStats(spark, "/tmp/graft_tq_docs")
      .collect()
    assert(got(0).getString(1) === "ha ha")
    assert(got(0).getLong(2) === 3L && got(0).getLong(3) === 3L)
    assert(got(0).getDouble(4) === 1.0)
    assert(got(1).getLong(2) === 1L && got(1).getLong(3) === 3L)
  }

  test("q268 readability: closed-form grade of a planted simple sentence") {
    import spark.implicits._
    // "the cat sat. the dog ran." -> w=6, s=2, y=6:
    // fk_ppm = 390000*6 div 2 + 11800000*6 div 6 - 15590000 = -2620000
    // (negative grade exercises the sign-factored average)
    val docs = Seq(("k", "The cat sat. The dog ran.")).toDF("source", "text")
    val r = graft.operators.TextQuality.readabilityOf(docs).head()
    assert(r.getAs[Long]("words") === 6L)
    assert(r.getAs[Long]("sentences") === 2L)
    assert(r.getAs[Long]("syllables") === 6L)
    assert(r.getAs[Long]("fk_avg_ppm") === -2620000L)
    // a long-word, run-on control must score strictly higher
    val hard = Seq(("k",
      "Administrative bureaucratization necessitates organizational " +
      "accountability irrespective of implementation")).toDF("source", "text")
    val h = graft.operators.TextQuality.readabilityOf(hard).head()
    assert(h.getAs[Long]("fk_avg_ppm") > r.getAs[Long]("fk_avg_ppm"))
  }
}
