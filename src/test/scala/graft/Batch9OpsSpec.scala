package graft

import graft.operators.{Curation, Quality, TextQuality}
import org.apache.spark.sql.functions._

/** Law checks for the round-9 curation/sketch operators
  * (q187-q190) — each is independently gated against DuckDB; these
  * specs pin the SEMANTICS against brute-force recomputations so a
  * refactor that changes both engine and oracle in the same wrong way
  * still fails.
  */
class Batch9OpsSpec extends SparkSpec {

  test("q187 paragraphDedup: kept lines are exactly the distinct lines, " +
    "each at its first occurrence") {
    val rows = Curation.paragraphDedup(spark, sf).collect()
    // rebuild the page corpus the operator saw
    val pages = Tables.documents(spark, sf)
      .select((col("doc_id") / 5).cast("long").as("page_id"),
        col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1)
      .map { case (pid, rs) =>
        pid -> rs.sortBy(_._2).map(_._3).mkString("\n")
      }
    val allLines = pages.toSeq.sortBy(_._1)
      .flatMap { case (pid, text) =>
        text.split("\n", -1).zipWithIndex.map { case (l, i) => (pid, i, l) } }
    val nDistinct = allLines.map(_._3).distinct.size
    // conservation: total kept == distinct line count
    assert(rows.map(_.getLong(2)).sum === nDistinct.toLong)
    // per page: the kept lines are those whose (page, pos) is the
    // global arg-min occurrence of the line
    val firstOcc = allLines.groupBy(_._3)
      .map { case (l, occ) => l -> occ.map(o => o._1 * 1000000L + o._2).min }
    rows.foreach { r =>
      val pid = r.getLong(0)
      val cleaned = r.getString(3)
      val expected = allLines
        .filter(o => o._1 == pid && firstOcc(o._3) == o._1 * 1000000L + o._2)
        .sortBy(_._2).map(_._3).mkString("\n")
      assert(cleaned === expected, s"page $pid")
    }
  }

  test("q188 qualityClassifier: score equals the brute-force integer form") {
    val got = TextQuality.qualityClassifier(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(5), r.getBoolean(6)))
      .toMap
    val stopRe = graft.functions.Text.stopwords.toMap.apply("en").r
    Tables.documents(spark, sf).select("doc_id", "text").collect()
      .foreach { r =>
        val id = r.getLong(0); val text = r.getString(1)
        val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
        val nToks = toks.size.toLong
        val wc = toks.map(_.length).sum.toLong
        val nc = text.length.toLong
        val nStop = stopRe.findAllIn(text).size.toLong
        val stopPm = nStop * 1000 / math.max(nToks, 1)
        val alnumPm = wc * 1000 / math.max(nc, 1)
        val avglen = wc * 1000 / math.max(nToks, 1)
        val score = 3000 * stopPm + 1000 * alnumPm -
          400 * math.abs(avglen - 4500) + 800 * math.min(nToks, 500) - 1000000
        val (gToks, gScore, gKeep) = got(id)
        assert(gToks === nToks, s"doc $id n_toks")
        assert(gScore === score, s"doc $id score")
        assert(gKeep === (score >= 0), s"doc $id keep")
      }
    // the threshold must actually split the corpus (a degenerate
    // all-keep / all-drop classifier gates nothing)
    val keeps = got.values.map(_._3).toSeq
    assert(keeps.contains(true) && keeps.contains(false))
  }

  test("q189 cmsAccuracy: CM overcount law holds and the estimate is " +
    "the min over the 4 probed cells") {
    val rows = Quality.cmsAccuracy(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      val exact = r.getLong(1); val est = r.getLong(2)
      val over = r.getLong(3); val slack = r.getLong(4)
      assert(est >= exact, s"${r.getString(0)}: CM must never undercount")
      assert(over === est - exact)
      assert(slack >= 0L)
    }
    // probes are the 20 heaviest tokens in exact-descending order
    val exacts = rows.map(_.getLong(1)).toSeq
    assert(exacts === exacts.sorted.reverse)
  }

  test("q190 sourceDrift: tvd_ppm equals the BigInt brute-force fold " +
    "and sits in [0, 1e6]") {
    val got = Curation.sourceDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val toks = Tables.documents(spark, sf).select("source", "text").collect()
      .flatMap { r =>
        "[a-z0-9]+".r.findAllIn(r.getString(1).toLowerCase)
          .map(w => (r.getString(0), w)) }
    val bySrcWord = toks.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val byWord = toks.groupBy(_._2).map { case (w, v) => w -> v.length.toLong }
    val bySrc = toks.groupBy(_._1).map { case (s, v) => s -> v.length.toLong }
    val nTot = BigInt(toks.length)
    assert(got.keySet === bySrc.keySet)
    bySrc.foreach { case (src, nS) =>
      val vocab = bySrcWord.keys.filter(_._1 == src).map(_._2).toSeq
      val cross = vocab.map { w =>
        (BigInt(bySrcWord((src, w))) * nTot - BigInt(byWord(w)) * nS).abs
      }.sum
      val tvd = (cross * 1000000 / (BigInt(nS) * nTot * 2)).toLong
      val (gTok, gVocab, gTvd) = got(src)
      assert(gTok === nS, s"$src tokens")
      assert(gVocab === vocab.size.toLong, s"$src vocab")
      assert(gTvd === tvd, s"$src tvd")
      assert(gTvd >= 0L && gTvd <= 1000000L)
    }
  }
}
